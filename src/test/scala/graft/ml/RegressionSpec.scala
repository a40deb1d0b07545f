package graft.ml

import graft.SparkSuite

class RegressionSpec extends SparkSuite {
  import spark.implicits._

  test("ols2: recovers exact plane y = 2 + 3*x1 - 0.5*x2, r2 = 1") {
    val rows = for (i <- 1 to 20; j <- 1 to 5)
      yield (2.0 + 3.0 * i - 0.5 * j, i.toDouble, j.toDouble)
    val r = Regression.ols2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r == ((100L, 2.0, 3.0, -0.5, 1.0)))
  }

  test("ols2: known noisy fit matches normal-equation hand solve") {
    // 4 points: y = [1,2,2,4], x1 = [0,1,2,3], x2 = [1,1,2,2]
    // means: y 2.25, x1 1.5, x2 1.5; c11 = 5, c22 = 1, c12 = 2,
    // c1y = 4.5, c2y = 1.5, cyy = 4.75; det = 5*1 - 4 = 1
    // b1 = 4.5*1 - 1.5*2 = 1.5; b2 = 1.5*5 - 4.5*2 = -1.5
    // b0 = 2.25 - 1.5*1.5 + 1.5*1.5 = 2.25
    // r2 = (1.5*4.5 - 1.5*1.5)/4.75 = 4.5/4.75
    val df = Seq((1.0, 0.0, 1.0), (2.0, 1.0, 1.0), (2.0, 2.0, 2.0),
      (4.0, 3.0, 2.0)).toDF("y", "x1", "x2")
    val r = Regression.ols2(df, "y", "x1", "x2")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 == 4L && r._2 == 2.25 && r._3 == 1.5 && r._4 == -1.5)
    assert(math.abs(r._5 - 4.5 / 4.75) < 1e-4 + 1e-12)
  }

  test("partialCorr: controlling for the common driver removes r") {
    // x = z + noise-free, y = z: r_xy = 1 via z only... instead use
    // exact: z in 1..4, x = z, y = 2z → all marginals 1, partial 0/0 null.
    val pure = (1 to 4).map(i => (i.toDouble, 2.0 * i, i.toDouble))
      .toDF("x", "y", "z")
    val rp = Regression.partialCorr(pure, "x", "y", "z")
      .as[(Long, Double, Double, Double, Option[Double])].head()
    assert(rp._2 == 1.0 && rp._3 == 1.0 && rp._4 == 1.0 && rp._5.isEmpty)
    // hand case: x=[1,2,3,4], y=[1,3,2,4], z=[1,1,2,2]
    // means 2.5, 2.5, 1.5; cxy = 25 - 25 = ... compute via sums:
    // sxy = 1+6+6+16 = 29, cxy = 29 - 4*2.5*2.5 = 4
    // sxz = 1+2+6+8 = 17, cxz = 17 - 15 = 2
    // syz = 1+3+4+8 = 16, cyz = 16 - 15 = 1
    // cxx = 30-25 = 5, cyy = 30-25 = 5, czz = 10-9 = 1
    // rxy = 4/5 = .8, rxz = 2/sqrt(5), ryz = 1/sqrt(5)
    // partial = (.8 - .4)/sqrt((1-.8)(1-.2)) = .4/.4 = 1.0
    val df = Seq((1.0, 1.0, 1.0), (2.0, 3.0, 1.0), (3.0, 2.0, 2.0),
      (4.0, 4.0, 2.0)).toDF("x", "y", "z")
    val r = Regression.partialCorr(df, "x", "y", "z")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._2 == 0.8 && r._5 == 1.0)
    assert(r._3 == math.rint(2.0 / math.sqrt(5) * 1e4) / 1e4)
  }

  test("ols2: collinear regressors yield null coefficients") {
    val df = Seq((1.0, 1.0, 2.0), (2.0, 2.0, 4.0), (3.0, 3.0, 6.0))
      .toDF("y", "x1", "x2")
    val r = Regression.ols2(df, "y", "x1", "x2")
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].head()
    assert(r._2.isEmpty && r._3.isEmpty && r._4.isEmpty)
  }

  test("logistic2: cell counts equal to expected counts make the " +
    "true beta the exact MLE") {
    // cells (x1,x2): (0,0) 5/10, (1,0) 8/10, (0,1) 8/10, (1,1) 16/17
    // score(β*) = 0 exactly for β* = (0, ln4, ln4)
    def cell(x1: Double, x2: Double, n: Int, ones: Int) =
      (0 until n).map(i => (if (i < ones) 1.0 else 0.0, x1, x2))
    val rows = cell(0, 0, 10, 5) ++ cell(1, 0, 10, 8) ++
      cell(0, 1, 10, 8) ++ cell(1, 1, 17, 16)
    val df = rows.toDF("y", "x1", "x2")
    val r = Regression.logistic2(df, "y", "x1", "x2").head()
    assert(r.getAs[Long]("n") == 47L)
    assert(r.getAs[Double]("b0") == 0.0)
    assert(r.getAs[Double]("b1") == 1.3863)   // ln 4
    assert(r.getAs[Double]("b2") == 1.3863)
    // deviance from the closed-form cell likelihood
    val ll = 10 * math.log(0.5) +
      2 * (8 * math.log(0.8) + 2 * math.log(0.2)) +
      16 * math.log(16.0 / 17) + math.log(1.0 / 17)
    assert(math.abs(r.getAs[Double]("deviance") - (-2 * ll)) < 1e-3)
    val ll0 = 37 * math.log(37.0 / 47) + 10 * math.log(10.0 / 47)
    assert(math.abs(r.getAs[Double]("mcfadden_r2") - (1 - ll / ll0))
      < 1e-3)
  }

  test("logistic2: constant regressor is singular; all-one labels " +
    "null mcfadden") {
    val const = (1 to 20).map(i =>
      (if (i % 2 == 0) 1.0 else 0.0, i.toDouble, 5.0))
      .toDF("y", "x1", "x2")
    val r = Regression.logistic2(const, "y", "x1", "x2").head()
    assert(r.isNullAt(r.fieldIndex("b0")))
    assert(r.getAs[Long]("n") == 20L)
    // all-one labels: the y-margin is degenerate → separation pushes
    // the intercept out but mcfadden's null model is undefined
    val ones = (1 to 10).map(i =>
      (1.0, i.toDouble, (i * i % 7).toDouble)).toDF("y", "x1", "x2")
    val o = Regression.logistic2(ones, "y", "x1", "x2").head()
    assert(o.isNullAt(o.fieldIndex("mcfadden_r2")))
  }

  test("poisson2: cell means equal to model rates make the true " +
    "beta the exact MLE; saturated fit has zero deviance") {
    // μ = exp(ln2 + ln3·x1 + ln5·x2) → cells 2, 6, 10, 30; y = μ
    val df = Seq((2.0, 0.0, 0.0), (6.0, 1.0, 0.0), (10.0, 0.0, 1.0),
      (30.0, 1.0, 1.0)).toDF("y", "x1", "x2")
    val r = Regression.poisson2(df, "y", "x1", "x2").head()
    assert(r.getAs[Double]("b0") == math.rint(math.log(2) * 1e4) / 1e4)
    assert(r.getAs[Double]("b1") == math.rint(math.log(3) * 1e4) / 1e4)
    assert(r.getAs[Double]("b2") == math.rint(math.log(5) * 1e4) / 1e4)
    assert(r.getAs[Double]("deviance") == 0.0)
    assert(r.getAs[Double]("mean_rate") == 12.0)
  }

  test("poisson2: constant regressor is singular; all-zero counts " +
    "have no intercept MLE") {
    val const = (1 to 10).map(i => (i.toDouble, 1.0, i.toDouble))
      .toDF("y", "x1", "x2")
    val r = Regression.poisson2(const, "y", "x1", "x2").head()
    assert(r.isNullAt(r.fieldIndex("b0")))
    val zeros = (1 to 5).map(i => (0.0, i.toDouble, (i % 2).toDouble))
      .toDF("y", "x1", "x2")
    val z = Regression.poisson2(zeros, "y", "x1", "x2").head()
    assert(z.isNullAt(z.fieldIndex("b0")))
  }

  test("huber2: outliers barely move the fit; a perfect fit takes " +
    "the zero-scale OLS path") {
    // low-leverage (central-x) gross outliers: Huber recovers the
    // line; plain OLS on the same data puts b2 NEGATIVE (−0.57)
    val noisy = (1 to 50).map { i =>
      val x1 = i.toDouble; val x2 = (i % 5).toDouble
      (1.0 + 2 * x1 + 3 * x2 + 0.1 * ((i * 7) % 11 - 5), x1, x2)
    }
    val spoiled = noisy ++ Seq((300.0, 25.0, 2.0), (-300.0, 26.0, 3.0))
    val r = Regression.huber2(spoiled.toDF("y", "x1", "x2"),
      "y", "x1", "x2").head()
    assert(math.abs(r.getAs[Double]("b1") - 2.0) < 0.05)
    assert(math.abs(r.getAs[Double]("b2") - 3.0) < 0.2)
    assert(r.getAs[Double]("share_downweighted") > 0.0)
    // exact line, no noise: OLS residuals are ~0 → MAD scale 0 →
    // the OLS solution is returned untouched
    val clean = (1 to 20).map { i =>
      val x1 = i.toDouble; val x2 = (i % 5).toDouble
      (1.0 + 2 * x1 + 3 * x2, x1, x2)
    }
    val p = Regression.huber2(clean.toDF("y", "x1", "x2"),
      "y", "x1", "x2").head()
    assert(p.getAs[Double]("b0") == 1.0)
    assert(p.getAs[Double]("b1") == 2.0)
    assert(p.getAs[Double]("b2") == 3.0)
    assert(p.getAs[Double]("scale") == 0.0)
  }

  test("huber2: the approx MAD-scale dispatch lands on the same " +
    "rounded fit as the exact path") {
    val noisy = (1 to 200).map { i =>
      val x1 = i.toDouble; val x2 = (i % 7).toDouble
      (1.0 + 2 * x1 + 3 * x2 + 0.1 * ((i * 7) % 11 - 5), x1, x2)
    }.toDF("y", "x1", "x2")
    val ex = Regression.huber2(noisy, "y", "x1", "x2",
      exactScale = Some(true)).head()
    val ap = Regression.huber2(noisy, "y", "x1", "x2",
      exactScale = Some(false)).head()
    assert(math.abs(ex.getAs[Double]("b1") -
      ap.getAs[Double]("b1")) < 1e-3)
    assert(math.abs(ex.getAs[Double]("b2") -
      ap.getAs[Double]("b2")) < 1e-2)
  }

  test("huber2: collinear design nulls out") {
    val df = (1 to 10).map(i => (i.toDouble, i.toDouble, 2.0 * i))
      .toDF("y", "x1", "x2")
    val r = Regression.huber2(df, "y", "x1", "x2").head()
    assert(r.isNullAt(r.fieldIndex("b0")))
  }

  test("segmented: exact broken stick is recovered") {
    // y = 2 + 3x below the knot at 5, slope 7 above → change +4
    val df = (1 to 10).map { x =>
      val y = if (x <= 5) 2.0 + 3 * x else 17.0 + 7 * (x - 5)
      (x.toDouble, y)
    }.toDF("x", "y")
    val r = Regression.segmented(df, "y", "x", knot = 5.0).head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("intercept") == 2.0)
    assert(r.getAs[Double]("slope_left") == 3.0)
    assert(r.getAs[Double]("slope_change") == 4.0)
    assert(r.getAs[Double]("slope_right") == 7.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("segmented: all data left of the knot makes the hinge " +
    "constant and the fit singular") {
    val df = (1 to 5).map(x => (x.toDouble, 2.0 + 3 * x)).toDF("x", "y")
    val r = Regression.segmented(df, "y", "x", knot = 10.0).head()
    assert(r.isNullAt(r.fieldIndex("slope_left")))
    assert(r.isNullAt(r.fieldIndex("slope_change")))
  }
}
