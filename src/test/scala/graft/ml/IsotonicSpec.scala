package graft.ml

import graft.SparkSuite

class IsotonicSpec extends SparkSuite {
  import spark.implicits._

  // one fact row per (bucket, label) repetition: bucket rates
  // 1.0, 0.0, 0.5 over weights 1, 1, 2 -> PAVA pools all three into
  // (1+0+2·0.5)/4 = 0.5? No: pooling is left-to-right:
  //   [1.0] then 0.0 violates -> pool to 0.5 (w=2);
  //   0.5 block (w=2, mean .5) arrives, .5 >= .5 -> pools to 0.5 (w=4)
  private val rows = Seq(
    (0.0, 1L),                       // bucket 0: rate 1.0
    (1.0, 0L),                       // bucket 1: rate 0.0
    (2.0, 1L), (2.0, 0L))            // bucket 2: rate 0.5

  test("calibrate: PAVA pools violators into weighted block means") {
    val df = rows.map { case (b, y) => ("g", b, y) }.toDF("k", "b", "y")
    val r = Isotonic.calibrate(df, "k", "b", "y")
      .orderBy("bucket")
      .as[(String, Double, Long, Double, Double)].collect().toSeq
    assert(r.map(_._4) == Seq(1.0, 0.0, 0.5))      // raw rates
    assert(r.map(_._5) == Seq(0.5, 0.5, 0.5))      // pooled fit
  }

  test("calibrate: an already-monotone sequence is unchanged and the " +
    "fit is nondecreasing") {
    val mono = Seq((0.0, 0L), (1.0, 0L), (1.0, 1L), (2.0, 1L))
      .map { case (b, y) => ("g", b, y) }.toDF("k", "b", "y")
    val r = Isotonic.calibrate(mono, "k", "b", "y")
      .orderBy("bucket")
      .as[(String, Double, Long, Double, Double)].collect().toSeq
    assert(r.map(_._5) == Seq(0.0, 0.5, 1.0))
    assert(r.map(_._5) == r.map(_._4))
    assert(r.map(_._5).sliding(2).forall(p => p.head <= p.last))
  }

  test("calibrate: keys fit independently") {
    val df = (rows.map { case (b, y) => ("g", b, y) } ++
      Seq(("h", 0.0, 0L), ("h", 1.0, 1L))).toDF("k", "b", "y")
    val m = Isotonic.calibrate(df, "k", "b", "y").collect()
      .groupBy(_.getString(0))
    assert(m("g").length == 3 && m("h").length == 2)
    assert(m("h").map(_.getDouble(4)).sorted.toSeq == Seq(0.0, 1.0))
  }
}
