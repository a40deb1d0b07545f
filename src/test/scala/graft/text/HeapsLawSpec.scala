package graft.text

import graft.SparkSuite

class HeapsLawSpec extends SparkSuite {
  import spark.implicits._

  test("heapsLaw: all-novel tokens fit beta = 1, k = 1 exactly") {
    // every token new -> V(N) = N -> ln V = 1 * ln N + 0
    val docs = Seq(("s", 1L, "a b"), ("s", 2L, "c d e"),
      ("s", 3L, "f g")).toDF("src", "id", "text")
    val r = CorpusStats.heapsLaw(docs, "src", "id", "text").head()
    assert(r.getAs[Double]("beta") == 1.0)
    assert(r.getAs[Double]("k") == 1.0)
    assert(r.getAs[Double]("r2") == 1.0)
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("vocab") == 7L)
  }

  test("heapsLaw: saturated template corpus fits beta ~ 0") {
    val docs = (1L to 6L).map(i => ("t", i, "same three words"))
      .toDF("src", "id", "text")
    val r = CorpusStats.heapsLaw(docs, "src", "id", "text").head()
    assert(r.getAs[Long]("vocab") == 3L)
    assert(r.getAs[Double]("beta") == 0.0)  // V constant after doc 1
    assert(r.getAs[Long]("n_docs") == 6L)
  }

  test("heapsLaw: strata fit independently; empty docs don't break " +
    "the checkpoints") {
    val docs = Seq(("a", 1L, ""), ("a", 2L, "x y"), ("a", 3L, "x z"),
      ("b", 1L, "q")).toDF("src", "id", "text")
    val r = CorpusStats.heapsLaw(docs, "src", "id", "text").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Long]("vocab") == 3L)
    assert(r("a").getAs[Long]("n_docs") == 2L) // empty doc filtered
    assert(r("b").isNullAt(r("b").fieldIndex("beta"))) // 1 checkpoint
  }
}
