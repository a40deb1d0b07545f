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
}
