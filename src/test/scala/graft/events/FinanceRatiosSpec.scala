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

  test("expectedShortfall: hand-traced VaR and tail mean") {
    // returns 0.1, -0.1, 0.1, -0.2, 0.05 → 5th pct at idx 0.2 between
    // -0.2 and -0.1 → VaR = -0.18; tail = {-0.2} → ES = -0.2
    val vals = Seq(100.0, 110.0, 99.0, 108.9, 87.12, 91.476)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("k", (i + 1).toLong, v) }
      .toDF("k", "d", "v")
    val r = Finance.expectedShortfall(df, "k", "d", "v", p = 0.05)
      .head()
    assert(r.getAs[Long]("n_returns") == 5L)
    assert(r.getAs[Double]("var_p") == -0.18)
    assert(r.getAs[Long]("n_tail") == 1L)
    assert(r.getAs[Double]("es_p") == -0.2)
  }

  test("expectedShortfall: single-bucket key drops out; wide p " +
    "averages a wider tail") {
    val df = Seq(("a", 1L, 100.0), ("k", 1L, 100.0), ("k", 2L, 90.0),
      ("k", 3L, 99.0), ("k", 4L, 89.1)).toDF("k", "d", "v")
    val rows = Finance.expectedShortfall(df, "k", "d", "v", p = 0.5)
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("k"))
    // returns -0.1, 0.1, -0.1 → median VaR -0.1, tail {-0.1, -0.1}
    val r = rows.head
    assert(r.getAs[Double]("var_p") == -0.1)
    assert(r.getAs[Long]("n_tail") == 2L)
    assert(r.getAs[Double]("es_p") == -0.1)
  }
}
