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

  test("abcXyz: value class crossed with demand-variability class") {
    // k1: buckets (10,10) cv=0 -> X; cum 2000/2200 > 80% -> B
    // k2: buckets (1,9) cv=1.1314 -> Z; cum 100% -> C
    val rows = Seq(("k1", 1, 10L, 1000L), ("k1", 2, 10L, 1000L),
      ("k2", 1, 1L, 100L), ("k2", 2, 9L, 100L))
    val df = rows.toDF("k", "mo", "q", "cents")
    val got = Abc.abcXyz(df, "k", "mo", "q", "cents")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[String]("abc_class"), r.getAs[String]("xyz_class"),
          r.getAs[String]("class")))).toMap
    assert(got("k1") == (("B", "X", "B-X")))
    assert(got("k2") == (("C", "Z", "C-Z")))
  }

  test("abcXyz: single-bucket key has null cv and lands in Z") {
    val df = Seq(("solo", 1, 5L, 100L)).toDF("k", "mo", "q", "cents")
    val r = Abc.abcXyz(df, "k", "mo", "q", "cents").head()
    assert(r.isNullAt(r.fieldIndex("cv")))
    assert(r.getAs[String]("xyz_class") == "Z")
  }
}
