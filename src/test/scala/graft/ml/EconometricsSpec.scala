package graft.ml

import graft.SparkSuite

class EconometricsSpec extends SparkSuite {
  import spark.implicits._

  test("kendallTauB: scipy parity without ties; tie-corrected " +
    "denominator with ties") {
    // x=1..5, y=(2,1,4,3,5): C=8, D=2 -> tau = 0.6
    val plain = Seq((1, 2), (2, 1), (3, 4), (4, 3), (5, 5))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = RankStats.kendallTauB(plain, "g", "x", "y").head()
    assert(r.getAs[Long]("n_concordant") == 8L)
    assert(r.getAs[Long]("n_discordant") == 2L)
    assert(r.getAs[Double]("tau_b") == 0.6)
    // x=(1,1,2), y=(1,2,2): C=1, D=0, tx=ty=1, n0=3 -> tau_b = 0.5
    val tied = Seq((1, 1), (1, 2), (2, 2))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    assert(RankStats.kendallTauB(tied, "g", "x", "y")
      .head().getAs[Double]("tau_b") == 0.5)
  }

  test("pacf3: exact-fraction Durbin-Levinson on an alternating series") {
    // x = 1,2,1,2,1,2: r = (-5/6, 2/3, -1/2);
    // pacf = (-5/6, -1/11, 1/10)
    val df = Seq(1, 2, 1, 2, 1, 2).zipWithIndex
      .map { case (x, t) => ("g", t, x) }.toDF("g", "t", "x")
    val r = TrendStats.pacf3(df, "g", "t", "x").head()
    assert(r.getAs[Double]("r1") == -0.8333)
    assert(r.getAs[Double]("r2") == 0.6667)
    assert(r.getAs[Double]("r3") == -0.5)
    assert(r.getAs[Double]("pacf1") == -0.8333)
    assert(r.getAs[Double]("pacf2") == -0.0909)
    assert(r.getAs[Double]("pacf3") == 0.1)
  }

  test("chowTest: hand-computed break F and its exact Beta(1,1) tail") {
    // regime 0: (0,0),(1,1),(2,1); regime 1: (0,5),(1,7),(2,8)
    // SSR0 = SSR1 = 1/6, SSRp = 534/9 - 4 -> F = 165, p = 2/332
    val df = Seq((0, 0.0, 0), (1, 1.0, 0), (2, 1.0, 0),
      (0, 5.0, 1), (1, 7.0, 1), (2, 8.0, 1)).toDF("x", "y", "regime")
    val r = Regression.chowTest(df, "y", "x", "regime").head()
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("f_stat") == 165.0)
    assert(r.getAs[Double]("p_value") == 0.006024)
  }

  test("durbinWatson: hand-computed residual chain") {
    // y = (1,3,2,4) on x = 1..4: slope .8, e = (-.3,.9,-.9,.3)
    // DW = 6.12 / 1.8 = 3.4 (negative serial correlation)
    val df = Seq((1, 1.0), (2, 3.0), (3, 2.0), (4, 4.0))
      .map { case (t, y) => ("g", t, t, y) }.toDF("g", "t", "x", "y")
    val r = Regression.durbinWatson(df, "g", "t", "y", "x").head()
    assert(r.getAs[Double]("slope") == 0.8)
    assert(r.getAs[Double]("dw") == 3.4)
  }
}
