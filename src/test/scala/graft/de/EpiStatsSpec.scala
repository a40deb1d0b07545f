package graft.de

import graft.SparkSuite

class EpiStatsSpec extends SparkSuite {
  import spark.implicits._

  test("holmHochberg: the classic case where step-down and step-up " +
    "disagree; nulls isolated") {
    // p = (.04, .05): terms (.08, .05)
    // Holm cummax -> (.08, .08); Hochberg reverse cummin -> (.05, .05)
    val df = Seq(("a", Some(0.04)), ("b", Some(0.05)),
      ("c", None: Option[Double])).toDF("id", "pvalue")
    val got = Stats.holmHochberg(df, "pvalue", Seq("id"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(r.fieldIndex("holm"))),
          Option(r.get(r.fieldIndex("hochberg")))))).toMap
    assert(got("a") == ((Some(0.08), Some(0.05))))
    assert(got("b") == ((Some(0.08), Some(0.05))))
    assert(got("c") == ((None, None)))
  }

  test("holmHochberg: monotone and capped at 1") {
    val df = Seq(0.5, 0.9, 0.95).zipWithIndex
      .map { case (p, i) => (i.toString, p) }.toDF("id", "pvalue")
    val r = Stats.holmHochberg(df, "pvalue", Seq("id"))
      .orderBy("pvalue").collect()
    val holm = r.map(_.getAs[Double]("holm")).toSeq
    assert(holm == Seq(1.0, 1.0, 1.0)) // 3*.5 capped, then cummax
    assert(r.map(_.getAs[Double]("hochberg")).toSeq == Seq(0.95, 0.95, 0.95))
  }

  test("concordanceIndex: perfect ranking is 1; score ties count half") {
    val df = Seq(
      ("g", 1.0, 1, 10.0), ("g", 2.0, 1, 5.0), ("g", 3.0, 0, 1.0),
      ("g", 1.5, 0, 10.0)) // censored at 1.5, ties A's score
      .toDF("grp", "t", "e", "s")
    val r = Survival.concordanceIndex(df, "grp", "t", "e", "s").head()
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Long]("n_concordant") == 3L)
    assert(r.getAs[Long]("n_tied") == 1L)
    assert(r.getAs[Double]("c_index") == 0.875)
  }

  test("concordanceIndex: Fenwick-sweep counts match the brute-force " +
    "pair join on randomized data (time and score ties included)") {
    // deterministic LCG so ties in BOTH t and s occur across groups
    def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L
    val rows = (0 until 400).map { i =>
      val h = math.abs(lcg(i.toLong * 31 + 7))
      (s"g${i % 3}",
        (math.abs(lcg(h)) % 20).toDouble,          // duration, heavy ties
        (math.abs(lcg(h + 1)) % 2).toInt,          // event flag
        (math.abs(lcg(h + 2)) % 15).toDouble)      // score, ties
    }
    val df = rows.toDF("grp", "t", "e", "s")
    val got = Survival.concordanceIndex(df, "grp", "t", "e", "s")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    // brute force on the driver
    rows.groupBy(_._1).foreach { case (g, rs) =>
      var pairs = 0L; var conc = 0L; var tied = 0L
      for ((_, ti, ei, si) <- rs; (_, tj, _, sj) <- rs
           if ei == 1 && ti < tj) {
        pairs += 1
        if (si > sj) conc += 1 else if (si == sj) tied += 1
      }
      val (gn, gp, gc, gt, ci) = got(g)
      assert(gn == rs.size && gp == pairs && gc == conc && gt == tied,
        s"$g: got ($gn,$gp,$gc,$gt) expected (${rs.size},$pairs,$conc,$tied)")
      assert(ci == BigDecimal((conc + tied / 2.0) / pairs)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("atkinson: geometric-mean EDE at eps=1, harmonic at eps=2") {
    val df = Seq(1.0, 1.0, 4.0).map(("g", _)).toDF("grp", "v")
    val a1 = graft.report.Inequality.atkinson(df, "grp", "v").head()
    assert(a1.getAs[Double]("atkinson") == 0.206299)
    val a2 = graft.report.Inequality.atkinson(df, "grp", "v",
      epsilon = 2.0).head()
    assert(a2.getAs[Double]("ede") == 1.3333)
    assert(a2.getAs[Double]("atkinson") == 0.333333)
  }

  test("standardizedRates: composition-adjusted rates; missing " +
    "stratum surfaces as null") {
    // pooled stratum weights: s1 = 4/12, s2 = 8/12
    val rows =
      Seq.fill(1)(("g1", "s1", 1)) ++ Seq.fill(1)(("g1", "s1", 0)) ++
        Seq.fill(2)(("g1", "s2", 0)) ++
        Seq.fill(2)(("g2", "s1", 0)) ++
        Seq.fill(3)(("g2", "s2", 1)) ++ Seq.fill(3)(("g2", "s2", 0))
    val df = rows.toDF("grp", "st", "ev")
    val got = Experiment.standardizedRates(df, "grp", "st", "ev")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("crude_rate"),
          Option(r.get(r.fieldIndex("std_rate")))))).toMap
    assert(got("g1") == ((0.25, Some(0.166667))))
    assert(got("g2") == ((0.375, Some(0.333333))))
    val g3 = df.union(Seq(("g3", "s1", 1)).toDF("grp", "st", "ev"))
    val r3 = Experiment.standardizedRates(g3, "grp", "st", "ev")
      .filter($"grp" === "g3").head()
    assert(r3.isNullAt(r3.fieldIndex("std_rate")))
  }

  test("mantelHaenszel: pooled OR and CMH chi2 on twin strata") {
    // two identical 3/1/1/3 tables: OR_MH = 9, chi2 = 3.5,
    // p = 1 - pchisq(3.5, 1) = 0.061369
    val one = Seq.fill(3)((1, 1)) ++ Seq.fill(1)((1, 0)) ++
      Seq.fill(1)((0, 1)) ++ Seq.fill(3)((0, 0))
    val df = (one.map { case (x, y) => ("s1", x, y) } ++
      one.map { case (x, y) => ("s2", x, y) }).toDF("st", "x", "y")
    val r = Experiment.mantelHaenszel(df, "st", "x", "y").head()
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Double]("or_mh") == 9.0)
    assert(r.getAs[Double]("chi2") == 3.5)
    assert(r.getAs[Double]("p_value") == 0.061369)
  }
}
