package graft.events

import graft.SparkSuite

class FinanceSpec extends SparkSuite {
  import spark.implicits._

  test("maxDrawdown: hand-traced equity curve with interior trough") {
    // flows: +10, -4, -3, +8, -2 → equity 10,6,3,11,9; peaks 10,10,10,11,11
    // drawdowns 0,4,7,0,2 → max 7 at bucket 3; final 9, peak 11.
    val df = Seq(("k", 1L, 10L), ("k", 2L, -4L), ("k", 3L, -3L),
      ("k", 4L, 8L), ("k", 5L, -2L)).toDF("k", "b", "f")
    val r = Finance.maxDrawdown(df, "k", "b", "f")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(r == (("k", 5L, 9L, 11L, 7L, 3L)))
  }

  test("maxDrawdown: monotone-up curve has zero drawdown at first bucket") {
    val df = Seq(("k", 1L, 5L), ("k", 2L, 5L), ("k", 3L, 5L))
      .toDF("k", "b", "f")
    val r = Finance.maxDrawdown(df, "k", "b", "f")
      .as[(String, Long, Long, Long, Long, Long)].head()
    // all drawdowns 0 → earliest bucket wins the tie
    assert(r == (("k", 3L, 15L, 15L, 0L, 1L)))
  }

  test("bollinger: incomplete windows null bands; breakout flagged") {
    // width 3, k=1: values 1,1,1,10 → at b=4 window (1,1,10): mean 4,
    // sd = sqrt(27) = 5.196, upper = 9.196 < 10 → break_up.
    val df = Seq(("k", 1L, 1.0), ("k", 2L, 1.0), ("k", 3L, 1.0),
      ("k", 4L, 10.0)).toDF("k", "b", "v")
    val r = Finance.bollinger(df, "k", "b", "v", width = 3, k = 1.0)
      .orderBy("b")
      .select("roll_n", "roll_mean", "break_up", "break_down")
      .as[(Long, Option[Double], Boolean, Boolean)].collect()
    assert(r(0) == ((1L, None, false, false)))
    assert(r(1) == ((2L, None, false, false)))
    assert(r(2) == ((3L, Some(1.0), false, false)))
    assert(r(3)._1 == 3L && r(3)._3 && !r(3)._4)
  }

  test("ohlcVwap: open/close by time order, vwap weighted") {
    // one key, one day: (t1, p=2, q=1), (t2, p=5, q=3), (t3, p=3, q=1)
    // open=2, high=5, low=2, close=3, volume=5, vwap=(2+15+3)/5=4.0
    val df = Seq(
      ("a", "2024-01-01 09:00:00", 1L, 2.0, 1L),
      ("a", "2024-01-01 10:00:00", 2L, 5.0, 3L),
      ("a", "2024-01-01 11:00:00", 3L, 3.0, 1L))
      .toDF("k", "ts", "id", "p", "q")
      .withColumn("ts", $"ts".cast("timestamp"))
    val r = Finance.ohlcVwap(df, "k", "ts", "id", "p", "q")
      .select("open", "high", "low", "close", "volume", "vwap", "n_trades")
      .as[(Double, Double, Double, Double, Long, Double, Long)].head()
    assert(r == ((2.0, 5.0, 2.0, 3.0, 5L, 4.0, 3L)))
  }

  test("ohlcVwap: same-timestamp ties broken by the tie column") {
    val df = Seq(
      ("a", "2024-01-01 09:00:00", 2L, 9.0, 1L),
      ("a", "2024-01-01 09:00:00", 1L, 4.0, 1L))
      .toDF("k", "ts", "id", "p", "q")
      .withColumn("ts", $"ts".cast("timestamp"))
    val r = Finance.ohlcVwap(df, "k", "ts", "id", "p", "q")
      .select("open", "close").as[(Double, Double)].head()
    assert(r == ((4.0, 9.0)))
  }
}
