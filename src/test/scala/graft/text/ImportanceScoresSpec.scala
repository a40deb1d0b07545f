package graft.text

import graft.SparkSuite

class ImportanceScoresSpec extends SparkSuite {
  import spark.implicits._

  test("importanceScores: source docs sharing the target's vocabulary " +
    "score above docs that don't") {
    val docs = Seq(
      (1L, "tgt", "alpha beta alpha gamma"),
      (2L, "tgt", "alpha beta beta"),
      (3L, "src", "alpha beta gamma"),      // pure target vocabulary
      (4L, "src", "zeta eta theta iota"))   // disjoint vocabulary
      .toDF("id", "slice", "text")
    val r = CorpusStats.importanceScores(docs, "id", "text",
      $"slice" === "tgt").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(3L, 4L))   // only source docs scored
    assert(r(3L).getAs[Double]("avg_log_ratio") >
      r(4L).getAs[Double]("avg_log_ratio"))
    assert(r(3L).getAs[Double]("avg_log_ratio") > 0)
    assert(r(4L).getAs[Double]("avg_log_ratio") < 0)
  }

  test("importanceScores: smoothing keeps unseen-in-target tokens " +
    "finite and n_tokens counts the doc's stream") {
    val docs = Seq((1L, true, "a a b"), (2L, false, "c c c c"))
      .toDF("id", "tgt", "text")
    val r = CorpusStats.importanceScores(docs, "id", "text", $"tgt")
      .head()
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(!r.getAs[Double]("avg_log_ratio").isInfinite)
    // hand-check: V=3, Tt=3, Ts=4; lr(c) = ln(0.5/4.5) - ln(4.5/5.5)
    val exp = math.log(0.5 / 4.5) - math.log(4.5 / 5.5)
    assert(r.getAs[Double]("avg_log_ratio") ==
      math.round(exp * 1e6) / 1e6)
  }
}
