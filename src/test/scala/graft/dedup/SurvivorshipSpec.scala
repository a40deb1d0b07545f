package graft.dedup

import graft.SparkSuite

class SurvivorshipSpec extends SparkSuite {
  import spark.implicits._

  test("goldenRecords clusters transitively and elects longest-then-min-id") {
    // 1,2,3,10 all mutually within jaccard 0.5 in block "al" (3 carries
    // an extra token → longest); 20 a singleton in another block
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta epsilon"),
      (10L, "alpha beta gamma zeta"),
      (20L, "zz totally different text here")).toDF("id", "text")
    val got = Survivorship.goldenRecords(df, "id", "text",
        windowSize = 3, minJaccard = 0.5, blockLen = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // SNM block "al" sorts the four alpha-texts adjacent; all pairs
    // within jaccard 0.5 → one cluster rooted at 1, golden = 3 (longest).
    assert(got == Seq((1L, 3L, 4L), (20L, 20L, 1L)))
  }

  test("singletons survive as their own golden record") {
    val df = Seq(
      (5L, "completely unique text one"),
      (6L, "zq unrelated other words")).toDF("id", "text")
    val got = Survivorship.goldenRecords(df, "id", "text")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 5L, 1L), (6L, 6L, 1L)))
  }

  test("tie on length elects the minimum id") {
    val df = Seq(
      (7L, "same same same"),
      (8L, "same same same")).toDF("id", "text")
    val got = Survivorship.goldenRecords(df, "id", "text")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 7L, 2L)))
  }
}
