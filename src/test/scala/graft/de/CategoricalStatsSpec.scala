package graft.de

import graft.SparkSuite

class CategoricalStatsSpec extends SparkSuite {
  import spark.implicits._

  private def table2x2(a: Int, b: Int, c: Int, d: Int) =
    (Seq.fill(a)((1, 1)) ++ Seq.fill(b)((1, 0)) ++
      Seq.fill(c)((0, 1)) ++ Seq.fill(d)((0, 0)))
      .map { case (x, y) => ("s", x, y) }.toDF("st", "x", "y")

  test("gTest: hand-computed G and Pearson side by side") {
    // (3,1,1,3): E = 2 everywhere -> G = 12 ln 1.5 - 4 ln 2 = 2.093,
    // Pearson = 4 * 1/2 = 2
    val r = InfoTheory.gTest(table2x2(3, 1, 1, 3), "x", "y").head()
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("df") == 1L)
    assert(r.getAs[Double]("g") == 2.093)
    assert(r.getAs[Double]("pearson_chi2") == 2.0)
  }

  test("mcnemar: only discordant pairs count; continuity correction") {
    // b = 6 pre-only, c = 2 post-only: chi2 = 16/8 = 2, cc = 9/8
    val df = (Seq.fill(6)((1, 0)) ++ Seq.fill(2)((0, 1)) ++
      Seq.fill(5)((1, 1)) ++ Seq.fill(5)((0, 0)))
      .map { case (p, q) => ("s", p, q) }.toDF("st", "pre", "post")
    val r = Experiment.mcnemar(df, "st", "pre", "post").head()
    assert(r.getAs[Long]("b") == 6L && r.getAs[Long]("c") == 2L)
    assert(r.getAs[Double]("chi2") == 2.0)
    assert(r.getAs[Double]("chi2_cc") == 1.125)
  }

  test("cohensH: arcsine-scale proportion effect") {
    // p_a = 0.5, p_b = 0.1 -> h = 2 asin(sqrt .5) - 2 asin(sqrt .1)
    val df = (Seq.fill(5)(("a", 1)) ++ Seq.fill(5)(("a", 0)) ++
      Seq.fill(1)(("b", 1)) ++ Seq.fill(9)(("b", 0)))
      .map { case (g, s) => ("s", g, s) }.toDF("st", "grp", "succ")
    val r = Experiment.cohensH(df, "st", "grp", "succ", "a", "b").head()
    val expected = BigDecimal(2 * math.asin(math.sqrt(0.5)) -
      2 * math.asin(math.sqrt(0.1)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("cohens_h") == expected)
    assert(expected == 0.9273)
  }

  test("mixDecomposition: exact three-way split of the mean change") {
    // p0: s1 (1,1), s2 (3,3) -> mean 2; p1: s1 (1), s2 (5,5,5) -> 4
    // mix = .5, rate = 1.0, interaction = .5 (sums to delta 2)
    val rows = Seq((0, "s1", 1.0), (0, "s1", 1.0), (0, "s2", 3.0),
      (0, "s2", 3.0), (1, "s1", 1.0), (1, "s2", 5.0), (1, "s2", 5.0),
      (1, "s2", 5.0))
    val df = rows.toDF("period", "stratum", "v")
    val r = Experiment.mixDecomposition(df, "period", "stratum", "v")
      .head()
    assert(r.getAs[Double]("mean_0") == 2.0)
    assert(r.getAs[Double]("mean_1") == 4.0)
    assert(r.getAs[Double]("delta") == 2.0)
    assert(r.getAs[Double]("mix_effect") == 0.5)
    assert(r.getAs[Double]("rate_effect") == 1.0)
    assert(r.getAs[Double]("interaction") == 0.5)
  }

  test("mixDecomposition: a stratum absent from one period keeps the " +
    "identity exact via the rate fallback") {
    val rows = Seq((0, "s1", 2.0), (1, "s1", 2.0), (1, "s2", 6.0))
    val r = Experiment.mixDecomposition(rows.toDF("period", "stratum",
      "v"), "period", "stratum", "v").head()
    val parts = r.getAs[Double]("mix_effect") +
      r.getAs[Double]("rate_effect") + r.getAs[Double]("interaction")
    assert(math.abs(parts - r.getAs[Double]("delta")) < 1e-9)
    assert(r.getAs[Double]("delta") == 2.0) // mean 2 -> 4
  }

  test("oddsRatioCi: Woolf interval brackets the OR; zero cell nulls") {
    val r = Experiment.oddsRatioCi(table2x2(3, 1, 1, 3), "st", "x", "y")
      .head()
    assert(r.getAs[Double]("odds_ratio") == 9.0)
    val se = math.sqrt(1.0 / 3 + 1 + 1 + 1.0 / 3)
    def rnd(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ci_lo") ==
      rnd(math.exp(math.log(9.0) - 1.959964 * se)))
    assert(r.getAs[Double]("ci_hi") ==
      rnd(math.exp(math.log(9.0) + 1.959964 * se)))
    assert(r.getAs[Double]("ci_lo") < 9.0 && 9.0 < r.getAs[Double]("ci_hi"))
    val z = Experiment.oddsRatioCi(table2x2(3, 0, 1, 3), "st", "x", "y")
      .head()
    assert(z.isNullAt(z.fieldIndex("odds_ratio")))
  }
}
