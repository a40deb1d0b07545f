package graft.de

import graft.SparkSuite

class InferenceSpec extends SparkSuite {
  import spark.implicits._

  test("fisherExact: the tea-tasting 2x2 matches R fisher.test") {
    // a=3 b=1 c=1 d=3 -> two-sided p = 34/70 = 0.485714
    val rows =
      Seq.fill(3)((1, 1)) ++ Seq.fill(1)((1, 0)) ++
        Seq.fill(1)((0, 1)) ++ Seq.fill(3)((0, 0))
    val df = rows.map { case (x, y) => ("s", x, y) }.toDF("st", "x", "y")
    val r = Inference.fisherExact(df, "st", "x", "y").head()
    assert((r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"),
      r.getAs[Long]("d")) == ((3L, 1L, 1L, 3L)))
    assert(r.getAs[Double]("p_value") == 0.485714)
    assert(r.getAs[Double]("odds_ratio") == 9.0)
  }

  test("fisherExact: independence-shaped table gives p = 1; zero " +
    "cell gives null odds ratio") {
    val indep = (Seq.fill(2)((1, 1)) ++ Seq.fill(2)((1, 0)) ++
      Seq.fill(2)((0, 1)) ++ Seq.fill(2)((0, 0)))
      .map { case (x, y) => ("s", x, y) }.toDF("st", "x", "y")
    assert(Inference.fisherExact(indep, "st", "x", "y")
      .head().getAs[Double]("p_value") == 1.0)
    val zc = (Seq.fill(3)((1, 1)) ++ Seq.fill(3)((0, 0)))
      .map { case (x, y) => ("s", x, y) }.toDF("st", "x", "y")
    val r = Inference.fisherExact(zc, "st", "x", "y").head()
    assert(r.isNullAt(r.fieldIndex("odds_ratio")))
    // perfect association on 3+3: p = 2/C(6,3) = 0.1
    assert(r.getAs[Double]("p_value") == 0.1)
  }

  test("oneWayF: hand-computed three-group ANOVA") {
    // groups: (1,2,3), (2,3,4), (4,5,6) — means 2,3,5; grand 10/3.
    // SSB = 3[(2-10/3)^2+(3-10/3)^2+(5-10/3)^2] = 3*(16/9+1/9+25/9) = 14
    // SSW = 2+2+2 = 6; d1=2, d2=6; F = (14/2)/(6/6) = 7.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 4.0), ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = Inference.oneWayF(df, Nil, "g", "v")
      .as[(Long, Long, Double, Long, Long, Double)].head()
    assert(r._1 == 3 && r._2 == 9 && r._3 == 7.0 && r._4 == 2 && r._5 == 6)
    // F tail closed form: I_0.3(3, 1) = 0.3^3 = 0.027 exactly
    assert(math.abs(r._6 - 0.027) < 1e-9)
  }

  test("oneWayF: identical groups yield F=0; single group yields nulls") {
    val flat = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val r = Inference.oneWayF(flat, Nil, "g", "v")
      .as[(Long, Long, Double, Long, Long, Double)].head()
    assert(r._3 == 0.0 && r._6 == 1.0)
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val r1 = Inference.oneWayF(one, Nil, "g", "v")
      .as[(Long, Long, Option[Double], Long, Long, Option[Double])].head()
    assert(r1._3.isEmpty && r1._6.isEmpty)
  }

  test("brownForsythe: hand-checked two-group deviations") {
    // a: 1,2,9 (median 2 → devs 1,0,7); b: 4,5,6 (median 5 → devs 1,0,1)
    // dev means: 8/3, 2/3; grand 5/3; SSB = 3(1^2 + 1^2) = 6
    // SSW = var-sum: a devs var_samp = ((1-8/3)^2+(0-8/3)^2+(7-8/3)^2)/2
    //   = (25/9+64/9+169/9)/2 = 258/18; b devs: (1/9+4/9+1/9)/2 = 6/18
    // SSW = 2*(258/18) + 2*(6/18) = 264/9; d1=1, d2=4
    // W = 6 / (264/36) = 36*6/264 = 0.8182
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 9.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Inference.brownForsythe(df, "g", "v")
      .as[(Long, Long, Double, Long, Long, Double)].head()
    assert(r._1 == 2 && r._2 == 6 && r._3 == 0.8182)
    // I_0.830189(2, 0.5) = 0.416866 (scipy.stats.levene center=median)
    assert(math.abs(r._6 - 0.416866) < 1e-6)
  }

  test("mannWhitney: scipy parity on a small two-group sample") {
    // a = [1,2,3,4], b = [3,5,6,7]: ranks 1,2,3.5,5 | 3.5,6,7,8
    // R_a = 11.5, U_a = 11.5 - 10 = 1.5; mu = 8, N = 8, ties: one pair
    // sigma^2 = 16/12 * (9 - 6/(8*7)) = 4/3 * (9 - 3/28) = 11.857
    // z = (1.5-8)/3.4434 = -1.8877; p = 0.059072 (no continuity corr.)
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("x", "a", _)) ++
      Seq(3.0, 5.0, 6.0, 7.0).map(("x", "b", _))).toDF("s", "g", "v")
    val r = Inference.mannWhitney(df, "s", "g", "v", "a", "b")
      .as[(String, Long, Long, Double, Double, Double)].head()
    assert(r._2 == 4 && r._3 == 4 && r._4 == 1.5)
    assert(r._5 == -1.8877)
    assert(math.abs(r._6 - 0.059072) < 1e-6)
  }

  test("mannWhitney: all-tied values give null z and p") {
    val df = Seq(("x", "a", 5.0), ("x", "a", 5.0),
      ("x", "b", 5.0), ("x", "b", 5.0)).toDF("s", "g", "v")
    val r = Inference.mannWhitney(df, "s", "g", "v", "a", "b")
      .as[(String, Long, Long, Double, Option[Double], Option[Double])]
      .head()
    assert(r._5.isEmpty && r._6.isEmpty)
  }

  test("effectSizes: hand-computed d, g, and Glass delta") {
    // case: 2,4,6 (m=4, s^2=4); ctrl: 1,2,3 (m=2, s^2=1)
    // pooled = sqrt((2*4+2*1)/4) = sqrt(2.5); d = 2/1.5811 = 1.2649
    // J = 1 - 3/(4*6-9) = 0.8; g = 1.0119; Glass = 2/1 = 2
    val df = Seq(("k", "t", 2.0), ("k", "t", 4.0), ("k", "t", 6.0),
      ("k", "c", 1.0), ("k", "c", 2.0), ("k", "c", 3.0)).toDF("k", "g", "v")
    val r = Inference.effectSizes(df, Seq("k"), "g", "v", "t", "c")
      .as[(String, Long, Long, Double, Double, Double, Double)].head()
    assert(r == (("k", 3L, 3L, 2.0, 1.2649, 1.0119, 2.0)))
  }
}
