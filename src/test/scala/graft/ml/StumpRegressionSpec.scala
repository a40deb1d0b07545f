package graft.ml

import graft.SparkSuite

class StumpRegressionSpec extends SparkSuite {
  import spark.implicits._

  test("giniStump: clean separation finds the boundary with full " +
    "gain") {
    // v <= 4 all negative, v >= 5 all positive -> threshold 4, gain =
    // parent gini (0.5 at balance)
    val rows = (1 to 4).map(v => ("g", v, 0)) ++
      (5 to 8).map(v => ("g", v, 1))
    val r = Stump.giniStump(rows.toDF("g", "v", "t"), "g", "v", "t")
      .head()
    assert(r.getAs[Int]("threshold") == 4)
    assert(r.getAs[Double]("gini_parent") == 0.5)
    assert(r.getAs[Double]("gain") == 0.5)
    assert(r.getAs[Double]("rate_left") == 0.0)
    assert(r.getAs[Double]("rate_right") == 1.0)
  }

  test("giniStump: constant feature yields no candidate split; ties " +
    "pick the smallest threshold") {
    val const = Seq(("c", 1, 0), ("c", 1, 1)).toDF("g", "v", "t")
    assert(Stump.giniStump(const, "g", "v", "t").count() == 0)
    // symmetric data: split at 1 and at 2 give identical gain ->
    // threshold 1 wins
    val sym = Seq(("s", 1, 1), ("s", 2, 0), ("s", 3, 1))
      .toDF("g", "v", "t")
    val r = Stump.giniStump(sym, "g", "v", "t").head()
    assert(r.getAs[Int]("threshold") == 1)
  }

  test("cooksDistance: a planted outlier dominates the influence " +
    "ranking") {
    val pts = (0 to 9).map(i => ("g", i.toDouble, 2.0 * i)) :+
      (("g", 10.0, 100.0))
    val top = Regression.cooksDistance(pts.toDF("g", "x", "y"),
      "g", "x", "y", topK = 2).collect()
      .sortBy(-_.getAs[Double]("cooks_d"))
    assert(top.head.getAs[Double]("x") == 10.0)
    assert(top.head.getAs[Double]("cooks_d") >
      top(1).getAs[Double]("cooks_d") * 5)
  }

  test("breuschPagan: fanning residuals score a large LM; " +
    "homoskedastic noise does not") {
    // variance grows with x -> heteroskedastic (deterministic +/-
    // alternation, magnitude proportional to x)
    val het = (1 to 60).map { i =>
      val e = (if (i % 2 == 0) 1.0 else -1.0) * i
      ("h", i.toDouble, 3.0 * i + e)
    }
    // constant-magnitude alternation -> homoskedastic
    val hom = (1 to 60).map { i =>
      val e = if (i % 2 == 0) 1.0 else -1.0
      ("o", i.toDouble, 3.0 * i + e)
    }
    val r = Regression.breuschPagan((het ++ hom).toDF("g", "x", "y"),
      "g", "x", "y").collect().map(x => x.getString(0) -> x).toMap
    assert(r("h").getAs[Double]("lm") > 10.0)
    assert(r("h").getAs[Double]("p_value") < 0.01)
    assert(r("o").getAs[Double]("lm") < 3.0)
    assert(r("o").getAs[Double]("p_value") > 0.05)
  }
}
