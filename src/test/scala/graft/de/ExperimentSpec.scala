package graft.de

import graft.SparkSuite

class ExperimentSpec extends SparkSuite {
  import spark.implicits._

  test("adjusted means match a driver-side replay of theta") {
    val units = Seq(
      ("A", 10.0, 22.0), ("A", 12.0, 25.0), ("A", 8.0, 18.0),
      ("B", 11.0, 28.0), ("B", 9.0, 23.0), ("B", 13.0, 30.0))
    val xs = units.map(_._2); val ys = units.map(_._3)
    val n = units.size
    val mx = xs.sum / n; val my = ys.sum / n
    val cxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }
      .sum / (n - 1)
    val vx = xs.map(x => (x - mx) * (x - mx)).sum / (n - 1)
    val theta = cxy / vx
    val adjA = units.filter(_._1 == "A")
      .map { case (_, x, y) => y - theta * (x - mx) }
    val expA = adjA.sum / adjA.size

    val r = Experiment.cupedReadout(
        units.toDF("variant", "pre", "post"), "variant", "pre", "post")
      .collect().map(row => row.getString(0) -> row).toMap
    assert(math.abs(r("A").getAs[Double]("adj_mean") - expA) < 1e-3)
    assert(r("A").getAs[Long]("n") == 3L)
  }

  test("zero pre-period variance degrades to the raw readout") {
    val units = Seq(("A", 5.0, 10.0), ("A", 5.0, 14.0),
      ("B", 5.0, 20.0), ("B", 5.0, 24.0)).toDF("variant", "pre", "post")
    val r = Experiment.cupedReadout(units, "variant", "pre", "post")
      .collect().map(row => row.getString(0) -> row).toMap
    assert(r("A").getAs[Double]("adj_mean") ==
      r("A").getAs[Double]("raw_mean"))
    assert(r("B").getAs[Double]("adj_var") ==
      r("B").getAs[Double]("raw_var"))
  }

  test("perfectly correlated covariate removes nearly all variance") {
    // post = 2*pre + variant effect: within-variant adj variance ~ 0
    val units = ((1 to 20).map(i => ("A", i.toDouble, 2.0 * i)) ++
      (1 to 20).map(i => ("B", i.toDouble, 2.0 * i + 5)))
      .toDF("variant", "pre", "post")
    val r = Experiment.cupedReadout(units, "variant", "pre", "post")
      .collect().map(row => row.getString(0) -> row).toMap
    assert(r("A").getAs[Double]("var_reduction") > 0.99)
    // and the A/B difference in adjusted means equals the true effect
    val diff = r("B").getAs[Double]("adj_mean") -
      r("A").getAs[Double]("adj_mean")
    assert(math.abs(diff - 5.0) < 1e-6)
  }

  test("twoProportionZ: hand-computed pooled z") {
    // A: 30/100, B: 20/100 → p̂ = 0.25,
    // z = 0.1 / sqrt(0.25·0.75·0.02) ≈ 1.6330
    val rows = (Seq.fill(30)(("s", "A", true)) ++
      Seq.fill(70)(("s", "A", false)) ++
      Seq.fill(20)(("s", "B", true)) ++
      Seq.fill(80)(("s", "B", false))).toDF("st", "grp", "ok")
    val r = Experiment.twoProportionZ(rows, "st", "grp", "ok", "A", "B")
      .collect().head
    assert(r.getAs[Long]("n_a") == 100L)
    assert(r.getAs[Long]("x_a") == 30L)
    assert(r.getAs[Double]("p_a") == 0.3)
    val z = 0.1 / math.sqrt(0.25 * 0.75 * 0.02)
    assert(r.getAs[Double]("z") ==
      BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("twoProportionZ: equal rates give z = 0; degenerate pooled " +
    "rate and missing group give null; extra groups are ignored") {
    val rows = (Seq.fill(5)(("eq", "A", true)) ++
      Seq.fill(5)(("eq", "A", false)) ++
      Seq.fill(3)(("eq", "B", true)) ++
      Seq.fill(3)(("eq", "B", false)) ++
      Seq.fill(4)(("allok", "A", true)) ++
      Seq.fill(4)(("allok", "B", true)) ++
      Seq.fill(4)(("onlya", "A", true)) ++
      Seq.fill(9)(("eq", "C", true))).toDF("st", "grp", "ok")
    val m = Experiment.twoProportionZ(rows, "st", "grp", "ok", "A", "B")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("eq").getAs[Double]("z") == 0.0)
    assert(m("eq").getAs[Long]("n_a") == 10L)    // C rows excluded
    assert(m("allok").isNullAt(m("allok").fieldIndex("z")))
    assert(m("onlya").isNullAt(m("onlya").fieldIndex("z")))
  }

  test("cochranArmitage: hand-computed trend z on a perfect gradient") {
    // doses 1,2,3 each n=2 with successes 0,1,2:
    // N=6 R=3 pbar=.5; wr=8 wn=12 wwn=28
    // T = 8 - .5*12 = 2; V = .25*(28 - 144/6) = 1 -> Z = 2, chi2 = 4
    val rows = Seq((1, 0), (1, 0), (2, 1), (2, 0), (3, 1), (3, 1))
    val df = rows.toDF("dose", "succ")
    val r = Experiment.cochranArmitage(df, "dose", "succ").head()
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("n_doses") == 3L)
    assert(r.getAs[Double]("t_stat") == 2.0)
    assert(r.getAs[Double]("z") == 2.0)
    assert(r.getAs[Double]("chi2") == 4.0)
  }

  test("cochranArmitage: flat rates give z = 0; constant-dose v = 0 " +
    "gives null z") {
    val flat = Seq((1, 1), (1, 0), (2, 1), (2, 0)).toDF("dose", "succ")
    assert(Experiment.cochranArmitage(flat, "dose", "succ")
      .head().getAs[Double]("z") == 0.0)
    val const = Seq((2, 1), (2, 0)).toDF("dose", "succ")
    val r = Experiment.cochranArmitage(const, "dose", "succ").head()
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("bayesAb: closed-form hand case P = 0.7") {
    // A: 1/2, B: 1/1 → Beta(2,2) vs Beta(2,1);
    // ∫ 6t(1−t)(1−t²) dt = 0.7 exactly
    val df = Seq(("s", "A", 1), ("s", "A", 0), ("s", "B", 1))
      .toDF("st", "grp", "x")
    val r = Experiment.bayesAb(df, "st", "grp", "x").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("s_b") == 1L)
    assert(r.getAs[Double]("p_b_beats_a") == 0.7)
  }

  test("bayesAb: identical arms give exactly 0.5; empty side null") {
    val same = (Seq.fill(2)(("s", "A", 1)) ++ Seq.fill(2)(("s", "A", 0))
      ++ Seq.fill(2)(("s", "B", 1)) ++ Seq.fill(2)(("s", "B", 0)))
      .toDF("st", "grp", "x")
    assert(Experiment.bayesAb(same, "st", "grp", "x").head()
      .getAs[Double]("p_b_beats_a") == 0.5)
    val lone = Seq(("s", "A", 1), ("s", "A", 0)).toDF("st", "grp", "x")
    val r = Experiment.bayesAb(lone, "st", "grp", "x").head()
    assert(r.isNullAt(r.fieldIndex("p_b_beats_a")))
  }

  test("bayesAb: dominant arm approaches 1") {
    val dom = (Seq.fill(20)(("s", "A", 0)) ++ Seq.fill(2)(("s", "A", 1))
      ++ Seq.fill(20)(("s", "B", 1)) ++ Seq.fill(2)(("s", "B", 0)))
      .toDF("st", "grp", "x")
    assert(Experiment.bayesAb(dom, "st", "grp", "x").head()
      .getAs[Double]("p_b_beats_a") > 0.9999)
  }
}
