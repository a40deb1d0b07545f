package graft.de

import graft.SparkSuite

class MomentsSpec extends SparkSuite {
  import spark.implicits._

  test("groupedMoments: symmetric data has zero skew, known kurtosis") {
    // {-2,-1,0,1,2}: mean 0, m2 = 2, m3 = 0, m4 = 34/5 = 6.8
    // skew 0, excess kurt = 6.8/4 - 3 = -1.3
    val df = Seq(-2.0, -1.0, 0.0, 1.0, 2.0).map(("g", _)).toDF("g", "v")
    val r = Moments.groupedMoments(df, "g", "v")
      .as[(String, Long, Double, Double, Double, Double)].head()
    assert(r._2 == 5 && r._3 == 0.0)
    assert(r._4 == math.rint(math.sqrt(2.0) * 1e4) / 1e4)
    assert(r._5 == 0.0 && r._6 == -1.3)
  }

  test("groupedMoments: right-skewed sample matches scipy population form") {
    // {0,0,0,1}: mean .25, m2 = .1875, m3 = (3*(-.25)^3 + .75^3)/4
    //   = (-0.046875 + 0.421875)/4 = 0.09375
    // skew = .09375/.1875^1.5 = 1.1547; m4 = (3*.00390625+.31640625)/4
    //   = .08203125; kurt = .08203125/.03515625 - 3 = -0.6667
    val df = Seq(0.0, 0.0, 0.0, 1.0).map(("g", _)).toDF("g", "v")
    val r = Moments.groupedMoments(df, "g", "v")
      .as[(String, Long, Double, Double, Double, Double)].head()
    assert(r._5 == 1.1547 && r._6 == -0.6667)
  }

  test("groupedMoments: constant group yields null shape stats") {
    val df = Seq(5.0, 5.0, 5.0).map(("g", _)).toDF("g", "v")
    val r = Moments.groupedMoments(df, "g", "v")
      .as[(String, Long, Double, Double, Option[Double], Option[Double])]
      .head()
    assert(r._4 == 0.0 && r._5.isEmpty && r._6.isEmpty)
  }

  test("cronbachAlpha: two perfectly correlated items") {
    // items u, v with v = u → item vars 1 each (var_samp of {1,2,3}),
    // totals {2,4,6} var 4; alpha = 2*(1 - 2/4) = 1.0
    val df = Seq((1L, "u", 1.0), (1L, "v", 1.0), (2L, "u", 2.0),
      (2L, "v", 2.0), (3L, "u", 3.0), (3L, "v", 3.0))
      .toDF("s", "i", "x")
    val r = Moments.cronbachAlpha(df, "s", "i", "x")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r == ((2L, 3L, 2.0, 4.0, 1.0)))
  }

  test("cronbachAlpha: missing cells zero-fill; repeated rows sum") {
    // subject 2 has no item v → cell (2,v)=0; item u for subject 1
    // arrives in two rows summing to 3.
    val df = Seq((1L, "u", 1.0), (1L, "u", 2.0), (1L, "v", 1.0),
      (2L, "u", 5.0)).toDF("s", "i", "x")
    val r = Moments.cronbachAlpha(df, "s", "i", "x")
      .as[(Long, Long, Double, Double, Double)].head()
    // cells: (1,u)=3, (1,v)=1, (2,u)=5, (2,v)=0
    // var u = var({3,5}) = 2; var v = var({1,0}) = 0.5; totals {4,5} var .5
    // alpha = 2*(1 - 2.5/0.5) = -8
    assert(r == ((2L, 2L, 2.5, 0.5, -8.0)))
  }
}
