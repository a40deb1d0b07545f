package graft.de

import graft.SparkSuite

class RankStatsSpec extends SparkSuite {
  import spark.implicits._

  test("chiSquare: hand-computed 2x2 contingency") {
    // | 30 10 | row 40      expected: 24 16
    // | 30 30 | row 60                36 24
    // chi2 = 36/24 + 36/16 + 36/36 + 36/24 = 1.5+2.25+1+1.5 = 6.25
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(30)(("b", "y"))
    val got = rows.toDF("u", "v")
    val r = RankStats.chiSquare(got, "u", "v")
      .as[(Double, Long, Long)].head()
    assert(r == ((6.25, 1L, 100L)))
  }

  test("rocAuc: perfect, random, and tied separations") {
    val perfect = Seq((0, 1.0), (0, 2.0), (1, 3.0), (1, 4.0))
      .toDF("y", "s")
    assert(RankStats.rocAuc(perfect, "y", "s")
      .as[(Double, Long, Long)].head() == ((1.0, 2L, 2L)))
    val inverted = Seq((1, 1.0), (1, 2.0), (0, 3.0), (0, 4.0))
      .toDF("y", "s")
    assert(RankStats.rocAuc(inverted, "y", "s")
      .as[(Double, Long, Long)].head()._1 == 0.0)
    // All scores tied: AUC is exactly 0.5 by the tie convention.
    val tied = Seq((1, 7.0), (0, 7.0), (1, 7.0), (0, 7.0)).toDF("y", "s")
    assert(RankStats.rocAuc(tied, "y", "s")
      .as[(Double, Long, Long)].head()._1 == 0.5)
  }

  test("rocAuc: single-class input yields null, not divide-by-zero") {
    val onlyPos = Seq((1, 1.0), (1, 2.0)).toDF("y", "s")
    val r = RankStats.rocAuc(onlyPos, "y", "s")
      .as[(Option[Double], Long, Long)].head()
    assert(r == ((None, 2L, 0L)))
  }

  test("rocAuc matches brute-force pair counting on a mixed sample") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 200).map(i =>
      (if (rnd.nextDouble() < 0.4) 1 else 0,
        math.rint(rnd.nextDouble() * 20) / 2.0))
    val pos = data.filter(_._1 == 1).map(_._2)
    val neg = data.filter(_._1 == 0).map(_._2)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = BigDecimal(wins / (pos.size.toDouble * neg.size))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = RankStats.rocAuc(data.toDF("y", "s"), "y", "s")
      .as[(Double, Long, Long)].head()
    assert(got == ((expected, pos.size.toLong, neg.size.toLong)))
  }

  test("groupedOls: exact line recovered per group") {
    // group g1 on y = 2x + 1 exactly; g2 on y = -x + 10.
    val pts = (1 to 10).map(i => ("g1", i.toDouble, 2.0 * i + 1)) ++
      (1 to 10).map(i => ("g2", i.toDouble, 10.0 - i))
    val got = RankStats.groupedOls(pts.toDF("g", "x", "y"),
        Seq("g"), "y", "x")
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("g1") == ((2.0, 1.0, 1.0, 10L)))
    assert(got("g2") == ((-1.0, 10.0, 1.0, 10L)))
  }

  test("contingencyEffects: independent table gives V = 0, " +
    "perfect association gives V = 1") {
    val indep = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val r1 = RankStats.contingencyEffects(indep, "x", "y")
      .collect().head
    assert(r1.getAs[Double]("chi2") == 0.0)
    assert(r1.getAs[Double]("cramers_v") == 0.0)
    val perfect = (Seq.fill(5)(("a", "u")) ++ Seq.fill(5)(("b", "v")))
      .toDF("x", "y")
    val r2 = RankStats.contingencyEffects(perfect, "x", "y")
      .collect().head
    assert(r2.getAs[Double]("cramers_v") == 1.0)
    assert(r2.getAs[Long]("dof") == 1L)
    // 2x2 with n=10, chi2=10: C = sqrt(10/20)
    assert(r2.getAs[Double]("contingency_c") ==
      BigDecimal(math.sqrt(0.5))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("contingencyEffects: degenerate 1xk table yields null V") {
    val df = Seq(("a", "u"), ("a", "v"), ("a", "u")).toDF("x", "y")
    val r = RankStats.contingencyEffects(df, "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("cramers_v")))
    assert(r.getAs[Long]("n_rows") == 1L)
  }
}
