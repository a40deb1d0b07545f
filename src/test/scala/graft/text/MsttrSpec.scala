package graft.text

import graft.SparkSuite

class MsttrSpec extends SparkSuite {
  import spark.implicits._

  test("msttr: fixed windows, trailing partial segment dropped") {
    // doc of 10 tokens, segLen 4 -> 2 full segments, 2 tokens dropped
    // seg1 "a b a b" -> 2 types / 4; seg2 "c d e f" -> 4 types / 4
    val docs = Seq(("s", 1L, "a b a b c d e f g g"))
      .toDF("src", "id", "text")
    val r = CorpusStats.msttr(docs, "src", "id", "text", segLen = 4)
      .head()
    assert(r.getAs[Long]("n_segments") == 2L)
    assert(r.getAs[Double]("msttr") == 0.75)   // (0.5 + 1.0) / 2
  }

  test("msttr: repetitive text scores lower than varied text; " +
    "segment-less strata give null") {
    val docs = Seq(
      ("rep", 1L, ("x " * 8).trim),
      ("var", 1L, "a b c d e f g h"),
      ("tiny", 1L, "just three tokens")).toDF("src", "id", "text")
    val r = CorpusStats.msttr(docs, "src", "id", "text", segLen = 8)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("rep").getAs[Double]("msttr") == 0.125)
    assert(r("var").getAs[Double]("msttr") == 1.0)
    assert(r("tiny").getAs[Long]("n_segments") == 0L)
    assert(r("tiny").isNullAt(r("tiny").fieldIndex("msttr")))
  }
}
