package graft.events

import graft.SparkSuite

class BacktestSpec extends SparkSuite {
  import spark.implicits._

  test("seasonalNaive: season-2 lag scores only the holdout rows") {
    // series: 10, 20, 12, 18 → forecasts at t3: 10, t4: 20
    // errors: 2, -2 → mae 2, rmse 2, mape = (2/12 + 2/18)/2 = 0.1389
    // smape = (2*2/22 + 2*2/38)/2 = (0.18182 + 0.10526)/2 = 0.1435
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 12.0),
      ("k", 4L, 18.0)).toDF("k", "b", "v")
    val r = Backtest.seasonalNaive(df, "k", "b", "v", season = 2)
      .as[(String, Long, Double, Double, Double, Double)].head()
    assert(r._2 == 2L && r._3 == 2.0 && r._4 == 2.0)
    assert(r._5 == math.rint((2.0 / 12 + 2.0 / 18) / 2 * 1e4) / 1e4)
    assert(r._6 == math.rint((4.0 / 22 + 4.0 / 38) / 2 * 1e4) / 1e4)
  }

  test("seasonalNaive: zero actuals drop from MAPE but not sMAPE") {
    val df = Seq(("k", 1L, 5.0), ("k", 2L, 0.0), ("k", 3L, 5.0))
      .toDF("k", "b", "v")
    val r = Backtest.seasonalNaive(df, "k", "b", "v", season = 1)
      .as[(String, Long, Double, Double, Double, Double)].head()
    // holdout: t2 (f=5, y=0, e=-5), t3 (f=0, y=5, e=5)
    // mape: only t3 → 1.0; smape: both → (2*5/5 + 2*5/5)/2 = 2.0
    assert(r._2 == 2L && r._5 == 1.0 && r._6 == 2.0)
  }

  test("maseSplit: hand-traced split, scale, and ratio") {
    // train 10,12,11,13 (lag-1 |e| = 2,1,2 → scale 5/3)
    // test 13,15,10,14 (forecasts 13,13,15,10 → |e| = 0,2,5,4)
    val df = (1 to 8).zip(Seq(10, 12, 11, 13, 13, 15, 10, 14))
      .map { case (b, v) => ("k", b.toLong, v.toDouble) }
      .toDF("k", "b", "v")
    val r = Backtest.maseSplit(df, "k", "b", "v", season = 1).head()
    assert(r.getAs[Long]("n_train") == 4L)
    assert(r.getAs[Long]("n_test_scored") == 4L)
    assert(r.getAs[Double]("test_mae") == 2.75)
    assert(r.getAs[Double]("train_scale") == 1.6667)
    assert(r.getAs[Double]("mase") == 1.65)
  }

  test("maseSplit: constant train half nulls mase; short train " +
    "yields null scale") {
    val flat = (1 to 6).zip(Seq(5, 5, 5, 6, 7, 8))
      .map { case (b, v) => ("k", b.toLong, v.toDouble) }
      .toDF("k", "b", "v")
    val r = Backtest.maseSplit(flat, "k", "b", "v", season = 1).head()
    assert(r.getAs[Double]("train_scale") == 0.0)
    assert(r.isNullAt(r.fieldIndex("mase")))
    // season 7 > train size: no train lag exists → null scale
    val short = (1 to 10).map(i => ("k", i.toLong, i.toDouble))
      .toDF("k", "b", "v")
    val s = Backtest.maseSplit(short, "k", "b", "v", season = 7).head()
    assert(s.isNullAt(s.fieldIndex("train_scale")))
  }
}
