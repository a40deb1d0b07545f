package graft.de

import graft.SparkSuite

class WeibullCochranSpec extends SparkSuite {
  import spark.implicits._

  test("weibullFit: exponential-ish data recovers shape ~1; exact " +
    "Weibull recovers its parameters") {
    // t_i = scale * (-ln(1-F_i))^(1/shape) with the SAME median-rank
    // F_i the fit uses -> regression is exact: shape 2, scale 10
    val n = 50
    val ts = (1 to n).map { i =>
      val f = (i - 0.3) / (n + 0.4)
      ("w", 10.0 * math.pow(-math.log(1 - f), 1.0 / 2.0))
    }
    val r = Survival.weibullFit(ts.toDF("g", "t"), "g", "t").head()
    assert(r.getAs[Double]("shape") == 2.0)
    assert(r.getAs[Double]("scale") == 10.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("weibullFit: non-positive durations are dropped; degenerate " +
    "group nulls") {
    val df = Seq(("g", 0.0), ("g", -1.0), ("g", 5.0), ("g", 5.0))
      .toDF("g", "t")
    val r = Survival.weibullFit(df, "g", "t").head()
    assert(r.getAs[Long]("n") == 2L)      // only the two positives
    assert(r.isNullAt(r.fieldIndex("shape"))) // zero x-variance
  }

  test("cochranQ: hand-computed 3-treatment table") {
    // blocks 1..4, treatments a,b,c; successes:
    // b1: a,b ; b2: a ; b3: a,b,c ; b4: (none present -> absent = 0)
    val rows = Seq((1, "a", 1), (1, "b", 1), (1, "c", 0),
      (2, "a", 1), (2, "b", 0), (2, "c", 0),
      (3, "a", 1), (3, "b", 1), (3, "c", 1))
    val r = Experiment.cochranQ(rows.toDF("b", "t", "x"),
      "b", "t", "x").head()
    // G = (3,2,1), T=6, sumG2=14; L=(2,1,3), sumL=6, sumL2=14
    // Q = 2*(3*14-36)/(3*6-14) = 2*6/4 = 3.0
    assert(r.getAs[Int]("k") == 3)
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Double]("q") == 3.0)
    assert(r.getAs[Double]("p_value") ==
      math.round(math.exp(-1.5) * 1e6) / 1e6)
  }

  test("cochranQ: duplicate cells OR; all-equal blocks denominator " +
    "-> null q") {
    val dup = Seq((1, "a", 0), (1, "a", 1), (1, "b", 1), (1, "c", 1),
      (2, "a", 1), (2, "b", 1), (2, "c", 1))
    val r = Experiment.cochranQ(dup.toDF("b", "t", "x"),
      "b", "t", "x").head()
    // every block saturated (L_i = k) -> kΣL - ΣL² = 0 -> null
    assert(r.isNullAt(r.fieldIndex("q")))
  }
}
