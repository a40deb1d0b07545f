package graft.events

import graft.SparkSuite

class FinanceRatiosSpec extends SparkSuite {
  import spark.implicits._

  test("sharpeSortino: hand-computed ratios on an exact return chain") {
    // v = 100, 110, 99, 108.9 -> r = +0.1, -0.1, +0.1 exactly
    // mean = 1/30, sd = .11547 -> sharpe .2887
    // downside least(r,0) = (0, -.1, 0): sd .057735 -> sortino .5774
    val df = Seq(("g", 1, 100.0), ("g", 2, 110.0), ("g", 3, 99.0),
      ("g", 4, 108.9)).toDF("k", "d", "v")
    val r = Finance.sharpeSortino(df, "k", "d", "v").head()
    assert(r.getAs[Long]("n_returns") == 3L)
    assert(r.getAs[Double]("mean_ret") == 0.033333)
    assert(r.getAs[Double]("sharpe") == 0.2887)
    assert(r.getAs[Double]("sortino") == 0.5774)
  }

  test("sharpeSortino: constant series gives null ratios, never a " +
    "division error") {
    val df = Seq(("g", 1, 5.0), ("g", 2, 5.0), ("g", 3, 5.0))
      .toDF("k", "d", "v")
    val r = Finance.sharpeSortino(df, "k", "d", "v").head()
    assert(r.isNullAt(r.fieldIndex("sharpe")))
    assert(r.isNullAt(r.fieldIndex("sortino")))
  }
}
