package graft.ml

import graft.SparkSuite

class ConformalSpec extends SparkSuite {
  import spark.implicits._

  // cal residuals {1,3,5}, test residuals {2,4,6}
  private val df = Seq(
    (1L, 1.0, 0.0, 1), (2L, 3.0, 0.0, 1), (3L, 5.0, 0.0, 1),
    (4L, 2.0, 0.0, 0), (5L, 4.0, 0.0, 0), (6L, 6.0, 0.0, 0))
    .toDF("id", "y", "pred", "cal")

  test("splitConformal: exact order-statistic quantile and " +
    "test coverage") {
    // alpha = .5: k = ceil(4·.5) = 2 → q̂ = 3; coverage = 1/3
    val r = Conformal.splitConformal(df, "id", "y", "pred", "cal",
      alpha = 0.5).head()
    assert(r.getAs[Long]("n_cal") == 3L)
    assert(r.getAs[Long]("n_test") == 3L)
    assert(r.getAs[Long]("rank_k") == 2L)
    assert(r.getAs[Double]("q_hat") == 3.0)
    assert(r.getAs[Double]("coverage") == 0.3333)
    assert(r.getAs[Double]("mean_width") == 6.0)
  }

  test("splitConformal: infeasible rank yields null, never a fake " +
    "guarantee") {
    // alpha = .01: k = ceil(4·.99) = 4 > n_cal = 3
    val r = Conformal.splitConformal(df, "id", "y", "pred", "cal",
      alpha = 0.01).head()
    assert(r.getAs[Long]("rank_k") == 4L)
    assert(r.isNullAt(r.fieldIndex("q_hat")))
    assert(r.isNullAt(r.fieldIndex("coverage")))
  }

  test("splitConformal: a wide-enough quantile covers everything") {
    // cal residual 10 dominates: alpha=.5 over {1,3,10} → q̂ = 3;
    // with alpha=.25 → k = 3 → q̂ = 10 → full coverage
    val big = Seq(
      (1L, 1.0, 0.0, 1), (2L, 3.0, 0.0, 1), (3L, 10.0, 0.0, 1),
      (4L, 2.0, 0.0, 0), (5L, 9.0, 0.0, 0))
      .toDF("id", "y", "pred", "cal")
    val r = Conformal.splitConformal(big, "id", "y", "pred", "cal",
      alpha = 0.25).head()
    assert(r.getAs[Double]("q_hat") == 10.0)
    assert(r.getAs[Double]("coverage") == 1.0)
  }
}
