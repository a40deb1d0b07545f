package graft.ml

import graft.SparkSuite

class HlBoostSpec extends SparkSuite {
  import spark.implicits._

  test("hosmerLemeshow: hand-computed 4-bin statistic and " +
    "even-dof tail") {
    val df = Seq((1L, 0.0, 0.1), (2L, 0.0, 0.2), (3L, 0.0, 0.3),
      (4L, 1.0, 0.4), (5L, 1.0, 0.6), (6L, 0.0, 0.7),
      (7L, 1.0, 0.8), (8L, 1.0, 0.9)).toDF("id", "y", "ph")
    val r = Calibration.hosmerLemeshow(df, "y", "ph", "id", bins = 4)
      .head()
    val hl = 0.09 / (0.3 * 0.85) + 0.09 / (0.7 * 0.65) +
      0.09 / (1.3 * 0.35) + 0.09 / (1.7 * 0.15)
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Double]("hl_stat") == math.rint(hl * 1e4) / 1e4)
    assert(r.getAs[Int]("dof") == 2)
    assert(r.getAs[Long]("n_degenerate_bins") == 0L)
    assert(r.getAs[Double]("p_value") ==
      math.rint(math.exp(-hl / 2) * 1e6) / 1e6)
  }

  test("hosmerLemeshow: perfectly separated 0/1 predictions are " +
    "all-degenerate, statistic 0") {
    val df = (1 to 8).map(i =>
      (i.toLong, (i % 2).toDouble, (i % 2).toDouble))
      .toDF("id", "y", "ph")
    val r = Calibration.hosmerLemeshow(df, "y", "ph", "id", bins = 4)
      .head()
    assert(r.getAs[Long]("n_degenerate_bins") == 4L)
    assert(r.getAs[Double]("hl_stat") == 0.0)
    assert(r.getAs[Double]("p_value") == 1.0)
  }

  test("stumpBoost: exactly separable data is fit in one round, " +
    "later rounds add zero stumps") {
    val df = Seq((0L, 0.0), (0L, 0.0), (1L, 10.0), (1L, 10.0),
      (2L, 10.0), (2L, 10.0)).toDF("h", "v")
    val rows = Boost.stumpBoost(df, "h", "v", rounds = 3).collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("split_at") == 0L)
    assert(rows(0).getAs[Double]("left_value") == 0.0)
    assert(rows(0).getAs[Double]("right_value") == 10.0)
    assert(rows(0).getAs[Double]("train_mse") == 0.0)
    assert(rows(1).getAs[Double]("left_value") == 0.0)
    assert(rows(1).getAs[Double]("right_value") == 0.0)
    assert(rows(2).getAs[Double]("train_mse") == 0.0)
  }

  test("stumpBoost: best variance-reduction split on a ramp") {
    // y = x on 0..3 → best first split at 1 (SSE 1.0 vs 2.0)
    val df = (0 to 3).map(i => (i.toLong, i.toDouble)).toDF("h", "v")
    val r = Boost.stumpBoost(df, "h", "v", rounds = 1).head()
    assert(r.getAs[Long]("split_at") == 1L)
    assert(r.getAs[Double]("left_value") == 0.5)
    assert(r.getAs[Double]("right_value") == 2.5)
    assert(r.getAs[Double]("train_mse") == 0.25)
  }

  test("stumpBoost: degenerate domain returns empty; cell cap " +
    "fails fast") {
    val one = Seq((5L, 1.0), (5L, 2.0)).toDF("h", "v")
    assert(Boost.stumpBoost(one, "h", "v").isEmpty)
    val wide = (1 to 10).map(i => (i.toLong, 1.0)).toDF("h", "v")
    val ex = intercept[IllegalArgumentException] {
      Boost.stumpBoost(wide, "h", "v", maxCells = 5L)
    }
    assert(ex.getMessage.contains("value-domain"))
  }
}
