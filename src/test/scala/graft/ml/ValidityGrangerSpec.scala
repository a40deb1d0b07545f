package graft.ml

import graft.SparkSuite

class ValidityGrangerSpec extends SparkSuite {
  import spark.implicits._

  test("validityIndices: well-separated blobs beat shuffled labels " +
    "on both indices") {
    def blob(lbl: Int, cx: Double, cy: Double) =
      (0 until 10).map(i => (lbl * 100 + i, lbl,
        Seq(cx + (i % 3) * 0.1, cy + (i % 2) * 0.1)))
    val pts = blob(0, 0, 0) ++ blob(1, 10, 0) ++ blob(2, 0, 10)
    val good = ClusterMetrics.validityIndices(
      pts.toDF("id", "lbl", "v"), "id", "lbl", "v").head()
    val bad = ClusterMetrics.validityIndices(
      pts.map { case (id, l, v) => (id, id % 3, v) }
        .toDF("id", "lbl", "v"), "id", "lbl", "v").head()
    assert(good.getAs[Int]("k") == 3)
    assert(good.getAs[Double]("ch_index") >
      bad.getAs[Double]("ch_index") * 10)
    assert(good.getAs[Double]("db_index") <
      bad.getAs[Double]("db_index") / 10)
  }

  test("validityIndices: single label yields null indices") {
    val df = Seq((1, 0, Seq(1.0, 2.0)), (2, 0, Seq(3.0, 4.0)))
      .toDF("id", "lbl", "v")
    val r = ClusterMetrics.validityIndices(df, "id", "lbl", "v")
      .head()
    assert(r.isNullAt(r.fieldIndex("ch_index")))
  }

  test("grangerLag1: x that IS tomorrow's y Granger-causes it; " +
    "pure noise does not") {
    // y_t = x_{t-1} exactly -> unrestricted fit perfect, tiny p
    val xs = (1 to 40).map(i => ((i * 37) % 19).toDouble)
    val caused = (1 until 40).map(t =>
      ("c", t, xs(t), xs(t - 1)))      // (key, t, x_t, y_t = x_{t-1})
    val r = Regression.grangerLag1(
      caused.toDF("k", "t", "x", "y"), "k", "t", "x", "y").head()
    assert(r.getAs[Double]("r2_unrestricted") == 1.0)
    assert(r.getAs[Double]("p_value") < 1e-6)
    // x constant -> singular design -> null F
    val flat = (1 to 30).map(t => ("f", t, 1.0, (t % 7).toDouble))
    val r2 = Regression.grangerLag1(
      flat.toDF("k", "t", "x", "y"), "k", "t", "x", "y").head()
    assert(r2.isNullAt(r2.fieldIndex("f")))
  }
}
