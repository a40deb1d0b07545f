package graft.ml

import graft.SparkSuite

class CausalSpec extends SparkSuite {
  import spark.implicits._

  test("aipwAte: balanced randomized design — all three estimators " +
    "agree on the exact effect") {
    // every (x1, x2) cell carries both arms; y = 5 + 2x1 + 3x2 + 4T
    val rows = for {
      x1 <- Seq(0.0, 1.0, 2.0); x2 <- Seq(0.0, 1.0)
      t <- Seq(0.0, 1.0)
    } yield (t, 5.0 + 2 * x1 + 3 * x2 + 4 * t, x1, x2)
    val r = Causal.aipwAte(rows.toDF("t", "y", "x1", "x2"),
      "t", "y", "x1", "x2").head()
    assert(r.getAs[Long]("n") == 12L && r.getAs[Long]("n_treated") == 6L)
    assert(r.getAs[Double]("ate_naive") == 4.0)
    assert(r.getAs[Double]("ate_regression") == 4.0)
    assert(r.getAs[Double]("ate_aipw") == 4.0)
    assert(r.getAs[Double]("mean_propensity") == 0.5)
  }

  test("aipwAte: confounded assignment — naive is biased, the " +
    "model-based estimators recover the truth") {
    // y = 10·x1 + 2·T exactly; treatment loads on x1 (1/4 vs 3/4)
    val rows = Seq(
      (1.0, 2.0, 0.0, 0.0), (0.0, 0.0, 0.0, 1.0),
      (0.0, 0.0, 0.0, 0.0), (0.0, 0.0, 0.0, 1.0),
      (1.0, 12.0, 1.0, 0.0), (1.0, 12.0, 1.0, 1.0),
      (1.0, 12.0, 1.0, 0.0), (0.0, 10.0, 1.0, 1.0))
    val r = Causal.aipwAte(rows.toDF("t", "y", "x1", "x2"),
      "t", "y", "x1", "x2").head()
    assert(r.getAs[Double]("ate_naive") == 7.0)
    // exact outcome models → residual corrections vanish → both
    // model-based estimators hit the true 2.0 regardless of ê
    assert(r.getAs[Double]("ate_regression") == 2.0)
    assert(r.getAs[Double]("ate_aipw") == 2.0)
  }

  test("aipwAte: an empty arm or degenerate design nulls out") {
    val oneArm = Seq((1.0, 5.0, 1.0, 0.0), (1.0, 6.0, 2.0, 1.0),
      (1.0, 7.0, 3.0, 0.0)).toDF("t", "y", "x1", "x2")
    val r = Causal.aipwAte(oneArm, "t", "y", "x1", "x2").head()
    assert(r.getAs[Long]("n_treated") == 3L)
    assert(r.isNullAt(r.fieldIndex("ate_aipw")))
  }
}
