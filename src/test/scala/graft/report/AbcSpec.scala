package graft.report

import graft.SparkSuite

class AbcSpec extends SparkSuite {
  import spark.implicits._

  test("classify: cumulative-share classes with exact boundaries") {
    // values 50, 30, 15, 5 (total 100): cum 50, 80, 95, 100
    // A: cum <= 80 → first two; B: cum <= 95 → third; C: last
    val df = Seq(("w", 50L), ("x", 30L), ("y", 15L), ("z", 5L))
      .toDF("k", "cents")
    val r = Abc.classify(df, "k", "cents")
      .orderBy("rank")
      .as[(String, Long, Long, Double, String)].collect().toSeq
    assert(r == Seq(
      ("w", 50L, 1L, 0.5, "A"), ("x", 30L, 2L, 0.8, "A"),
      ("y", 15L, 3L, 0.95, "B"), ("z", 5L, 4L, 1.0, "C")))
  }

  test("classify: value ties broken by key; custom thresholds") {
    val df = Seq(("b", 10L), ("a", 10L), ("c", 10L)).toDF("k", "cents")
    val r = Abc.classify(df, "k", "cents", aPct = 34, bPct = 67)
      .orderBy("rank")
      .as[(String, Long, Long, Double, String)].collect().toSeq
    assert(r.map(_._1) == Seq("a", "b", "c"))
    assert(r.map(_._5) == Seq("A", "B", "C"))
  }
}
