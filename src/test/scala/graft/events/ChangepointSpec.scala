package graft.events

import graft.SparkSuite

class ChangepointSpec extends SparkSuite {
  import spark.implicits._

  test("a clean level shift is found at the shift boundary") {
    // 10 points at 5, then 10 points at 50: best split = last low point
    val xs = (0 until 10).map(i => ("g", i, 5L)) ++
      (10 until 20).map(i => ("g", i, 50L))
    val r = Changepoint.meanShiftScan(xs.toDF("g", "t", "x"),
      "g", "t", "x").head()
    assert(r.getAs[Int]("split_at") == 9)
    assert(r.getAs[Long]("n") == 20)
  }

  test("stat matches the hand-computed CUSUM contrast at the split") {
    val xs = Seq(2L, 2L, 2L, 2L, 8L, 8L, 8L, 8L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "t", "x")
    val r = Changepoint.meanShiftScan(df, "g", "t", "x", minSeg = 2)
      .head()
    // split i=4: mL=2, mR=8, stat = 36 * (4*4/8) = 72
    assert(r.getAs[Int]("split_at") == 3)
    assert(r.getAs[Double]("stat") == 72.0)
  }

  test("constant series ties break to the earliest admissible split") {
    val df = (0 until 10).map(i => ("g", i, 4L)).toDF("g", "t", "x")
    val r = Changepoint.meanShiftScan(df, "g", "t", "x", minSeg = 3)
      .head()
    assert(r.getAs[Double]("stat") == 0.0)
    assert(r.getAs[Int]("split_at") == 2) // i = minSeg, earliest kept
  }

  test("keys shorter than 2*minSeg drop out; groups independent") {
    val df = ((0 until 4).map(i => ("short", i, 1L)) ++
      (0 until 8).map(i => ("ok", i, if (i < 4) 0L else 9L)))
      .toDF("g", "t", "x")
    val out = Changepoint.meanShiftScan(df, "g", "t", "x", minSeg = 3)
      .collect()
    assert(out.length == 1 && out.head.getString(0) == "ok")
    assert(out.head.getAs[Int]("split_at") == 3)
  }

  test("edge splits need a bigger contrast: centered shift wins") {
    // one early outlier vs a true centered shift of the same size
    val xs = Seq(9L, 1L, 1L, 1L, 1L, 1L, 9L, 9L, 9L, 9L, 9L, 1L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "t", "x")
    val r = Changepoint.meanShiftScan(df, "g", "t", "x", minSeg = 2)
      .head()
    assert(r.getAs[Int]("split_at") == 5)
  }

  test("cusum: in-control series raises no alarms and stays near zero") {
    // mean 10, slack k=2, h=5: deviations never accumulate past h
    val xs = Seq(10L, 11L, 9L, 10L, 12L, 8L, 10L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "t", "x")
    val r = Changepoint.cusum(df, "g", "t", "x", mu0 = 10.0, k = 2.0,
      h = 5.0).head()
    assert(r.getAs[Long]("n_alarms") == 0L)
    assert(r.isNullAt(r.fieldIndex("first_alarm")))
    assert(r.getAs[Double]("s_pos") == 0.0)
  }

  test("cusum: sustained upward shift alarms at the hand-computed step") {
    // mu0=10, k=1, h=5; shift to 14 from step 4 (1-based):
    // S+ gains 3 per step → crosses 5 at the SECOND shifted point
    val xs = Seq(10L, 10L, 10L, 14L, 14L, 14L, 14L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "t", "x")
    val r = Changepoint.cusum(df, "g", "t", "x", mu0 = 10.0, k = 1.0,
      h = 5.0).head()
    assert(r.getAs[Long]("first_alarm") == 5L)
    assert(r.getAs[Long]("n_alarms") >= 1L)
  }

  test("cusum: downward shift trips the negative side; reset-on-alarm " +
    "restarts accumulation") {
    val xs = Seq(10L, 2L, 2L, 10L, 10L, 2L, 2L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "t", "x")
    // each low point adds 10-1-2=7 to S-: alarms at steps 2 and 3
    // (reset after each crossing), then again at 6 and 7
    val r = Changepoint.cusum(df, "g", "t", "x", mu0 = 10.0, k = 1.0,
      h = 5.0).head()
    assert(r.getAs[Long]("first_alarm") == 2L)
    assert(r.getAs[Long]("n_alarms") == 4L)
    assert(r.getAs[Double]("s_neg") == 0.0)   // reset by final alarm
  }

  test("pageHinkley: hand-computed drift off the floor") {
    // x = 0,0,10,10 with delta 0:
    // PH = 0, 0, 6.6667 (10 - mean 10/3), 11.6667 (+10 - mean 5)
    // running min stays 0 -> stat = 11.6667 at t=3, alarm at lambda 10
    val df = Seq(0L, 0L, 10L, 10L).zipWithIndex
      .map { case (x, i) => ("g", i, x) }.toDF("g", "t", "x")
    val r = Changepoint.pageHinkley(df, "g", "t", "x", delta = 0.0,
      lambda = 10.0).head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("ph_stat") == 11.6667)
    assert(r.getAs[Int]("detect_at") == 3)
    assert(r.getAs[Boolean]("alarm"))
  }

  test("pageHinkley: flat series has zero statistic, no alarm") {
    val df = Seq.fill(5)(7L).zipWithIndex
      .map { case (x, i) => ("g", i, x) }.toDF("g", "t", "x")
    val r = Changepoint.pageHinkley(df, "g", "t", "x", delta = 0.0,
      lambda = 1.0).head()
    assert(r.getAs[Double]("ph_stat") == 0.0)
    assert(!r.getAs[Boolean]("alarm"))
    assert(r.getAs[Int]("detect_at") == 0) // earliest tie
  }
}
