package graft.de

import graft.SparkSuite

class YuenMoodSpec extends SparkSuite {
  import spark.implicits._

  test("yuenTrimmed: hand-traced trim, winsorized variance, df") {
    // A: {0,10,10,10,10,100} → kept {10×4}, tm 10, winsorized var 0
    // B: {1..5} → kept {2,3,4}, tm 3, winsorized {2,2,3,4,4} var 1
    val df = (Seq(0.0, 10.0, 10.0, 10.0, 10.0, 100.0).map(("s", "A", _))
      ++ (1 to 5).map(i => ("s", "B", i.toDouble)))
      .toDF("st", "g", "v")
    val r = Inference.yuenTrimmed(df, "st", "g", "v", "A", "B")
      .head()
    assert(r.getAs[Long]("h_a") == 4L && r.getAs[Long]("h_b") == 3L)
    assert(r.getAs[Double]("tmean_a") == 10.0)
    assert(r.getAs[Double]("tmean_b") == 3.0)
    val t = 7.0 / math.sqrt(2.0 / 3)
    assert(r.getAs[Double]("t_stat") == math.rint(t * 1e4) / 1e4)
    assert(r.getAs[Double]("df") == 2.0)
    // exact two-sided t tail at df = 2: 1 − t/√(t²+2)
    val p = 1.0 - t / math.sqrt(t * t + 2)
    assert(math.abs(r.getAs[Double]("p_value") - p) < 1e-5)
  }

  test("yuenTrimmed: a single-observation group nulls the test") {
    val df = (Seq(("s", "A", 5.0)) ++
      (1 to 5).map(i => ("s", "B", i.toDouble))).toDF("st", "g", "v")
    val r = Inference.yuenTrimmed(df, "st", "g", "v", "A", "B")
      .head()
    assert(r.isNullAt(r.fieldIndex("t_stat")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("moodMedian: hand-computed 2x2 counts; odd dof leaves p " +
    "honest-null") {
    val df = ((1 to 4).map(i => ("a", i.toDouble)) ++
      (5 to 8).map(i => ("b", i.toDouble))).toDF("g", "v")
    val r = Inference.moodMedian(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("grand_median") == 4.5)
    assert(r.getAs[Double]("chi2") == 8.0)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("moodMedian: even dof takes the closed-form tail") {
    val df = ((1 to 4).map(i => ("a", i.toDouble)) ++
      (5 to 8).map(i => ("b", i.toDouble)) ++
      Seq(2.0, 3.0, 6.0, 7.0).map(("c", _))).toDF("g", "v")
    val r = Inference.moodMedian(df, "g", "v").head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("dof") == 2L)
    assert(r.getAs[Double]("chi2") == 8.0)
    assert(r.getAs[Double]("p_value") ==
      math.rint(math.exp(-4.0) * 1e6) / 1e6)
  }
}
