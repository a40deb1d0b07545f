package graft.report

import graft.SparkSuite

class InequalitySpec extends SparkSuite {
  import spark.implicits._

  test("gini: perfect equality is 0, extreme concentration near 1") {
    val eq = Seq(("g", 1L, 100L), ("g", 2L, 100L), ("g", 3L, 100L),
      ("g", 4L, 100L)).toDF("grp", "unit", "v")
    val r1 = Inequality.gini(eq, "grp", "unit", "v").collect().head
    assert(r1.getAs[Double]("gini") == 0.0)
    // one unit owns everything: G = (n-1)/n = 0.75 for n=4
    val conc = Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 0L),
      ("g", 4L, 400L)).toDF("grp", "unit", "v")
    val r2 = Inequality.gini(conc, "grp", "unit", "v").collect().head
    assert(r2.getAs[Double]("gini") == 0.75)
  }

  test("gini: hand-computed [1,2,3,4] = 0.25; groups independent") {
    val df = (Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("a", 4L, 4L)) ++ Seq(("b", 1L, 5L), ("b", 2L, 5L)))
      .toDF("grp", "unit", "v")
    val m = Inequality.gini(df, "grp", "unit", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    // Σi·x = 1+4+9+16 = 30; G = 2·30/(4·10) − 5/4 = 1.5 − 1.25
    assert(m("a") == 0.25)
    assert(m("b") == 0.0)
  }

  test("hhi: monopoly 10000, even duopoly 5000, top_share tracks CR1") {
    val df = (Seq(("m", 1L, 500L)) ++
      Seq(("d", 1L, 300L), ("d", 2L, 300L)) ++
      Seq(("t", 1L, 600L), ("t", 2L, 300L), ("t", 3L, 100L)))
      .toDF("grp", "firm", "v")
    val rows = Inequality.hhi(df.select($"grp", $"v"), "grp", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("m").getAs[Double]("hhi") == 10000.0)
    assert(rows("d").getAs[Double]("hhi") == 5000.0)
    // shares .6/.3/.1 → .36+.09+.01 = .46 → 4600
    assert(rows("t").getAs[Double]("hhi") == 4600.0)
    assert(rows("t").getAs[Double]("top_share") == 0.6)
  }

  test("theil: equal values give zero within and zero between for " +
    "proportional groups; decomposition terms sum to total") {
    val df = (Seq(("a", 1L, 10L), ("a", 2L, 10L)) ++
      Seq(("b", 1L, 10L), ("b", 2L, 10L), ("b", 3L, 10L)))
      .toDF("grp", "unit", "v")
    val rows = Inequality.theilDecomposition(
      df.select($"grp", $"v"), "grp", "v").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("theil_within") == 0.0)
      assert(r.getAs[Double]("within_term") == 0.0)
      assert(r.getAs[Double]("between_term") == 0.0)
    }
  }

  test("theil: within + between reproduces the pooled Theil index") {
    val df = (Seq(("a", 1L, 1L), ("a", 2L, 3L)) ++
      Seq(("b", 1L, 2L), ("b", 2L, 10L)))
      .toDF("grp", "unit", "v")
    val rows = Inequality.theilDecomposition(
      df.select($"grp", $"v"), "grp", "v").collect()
    val sumTerms = rows.map(r => r.getAs[Double]("within_term") +
      r.getAs[Double]("between_term")).sum
    // pooled Theil over [1,3,2,10]: μ=4, T = Σ (x/16) ln(x/4)
    val xs = Seq(1.0, 3.0, 2.0, 10.0)
    val pooled = xs.map(x => x / 16.0 * math.log(x / 4.0)).sum
    assert(approx(sumTerms, pooled, 1e-5))
  }
}
