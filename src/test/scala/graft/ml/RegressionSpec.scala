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

  test("ols2: collinear regressors yield null coefficients") {
    val df = Seq((1.0, 1.0, 2.0), (2.0, 2.0, 4.0), (3.0, 3.0, 6.0))
      .toDF("y", "x1", "x2")
    val r = Regression.ols2(df, "y", "x1", "x2")
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].head()
    assert(r._2.isEmpty && r._3.isEmpty && r._4.isEmpty)
  }
}
