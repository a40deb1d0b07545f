package graft.de

import graft.SparkSuite

class GofEvtSpec extends SparkSuite {
  import spark.implicits._

  test("normalityBattery: near-normal grid passes, exponential-ish " +
    "data rejects on both statistics") {
    // an exact normal quantile grid (continuous, no ties) -> accepts
    val nd = new org.apache.commons.math3.distribution
      .NormalDistribution(10.0, 2.0)
    val bell = (1 to 200).map(i =>
      ("bell", nd.inverseCumulativeProbability((i - 0.5) / 200.0)))
    // exponential-ish: heavily right-skewed
    val exp = (1 to 200).map(i =>
      ("expo", -math.log(i / 201.0)))
    val r = Gof.normalityBattery((bell ++ exp).toDF("g", "v"),
      "g", "v").collect().map(x => x.getString(0) -> x).toMap
    assert(!r("bell").getAs[Boolean]("ad_reject_5pct"))
    assert(r("expo").getAs[Boolean]("ad_reject_5pct"))
    assert(r("expo").getAs[Boolean]("cvm_reject_5pct"))
    assert(r("expo").getAs[Double]("a2_star") >
      r("bell").getAs[Double]("a2_star"))
  }

  test("normalityBattery: degenerate groups drop out") {
    val df = Seq(("c", 1.0), ("c", 1.0), ("c", 1.0), ("c", 1.0),
      ("c", 1.0), ("small", 1.0), ("small", 2.0)).toDF("g", "v")
    assert(Gof.normalityBattery(df, "g", "v").count() == 0)
  }

  test("adTwoSample: same distribution scores A2 near 1; disjoint " +
    "samples blow it up") {
    val same = (1 to 50).flatMap(i =>
      Seq(("same", "a", i.toDouble), ("same", "b", i + 0.5)))
    val apart = (1 to 50).map(i => ("apart", "a", i.toDouble)) ++
      (1 to 50).map(i => ("apart", "b", 1000.0 + i))
    val r = Gof.adTwoSample((same ++ apart).toDF("s", "g", "v"),
      "s", "g", "v", "a", "b").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("apart").getAs[Double]("a2") >
      r("same").getAs[Double]("a2") * 5)
    assert(r("apart").getAs[Double]("p_value") < 0.001)
    assert(r("same").getAs[Double]("p_value") > 0.1)
  }

  test("gpdTail: a heavy (Pareto-ish) tail fits xi > 0, a bounded " +
    "uniform tail fits xi < 0") {
    // Pareto(alpha=2) via inverse CDF -> true xi = 0.5
    val heavy = (1 to 2000).map(i =>
      ("heavy", 1.0 / math.sqrt(i / 2001.0)))
    val bounded = (1 to 2000).map(i => ("unif", i / 2001.0))
    val r = Evt.gpdTail((heavy ++ bounded).toDF("g", "v"), "g", "v",
      q = 0.9).collect().map(x => x.getString(0) -> x).toMap
    assert(r("heavy").getAs[Double]("xi") > 0.15)
    assert(r("unif").getAs[Double]("xi") < 0.0)
    assert(r("heavy").getAs[Long]("n_exceed") == 200L)
  }

  test("gpdTail: a group with zero exceedances (ties at the " +
    "quantile) still emits its row with n_exceed = 0 and null fits") {
    val const = (1 to 100).map(i => ("const", 7.0))
    val live = (1 to 100).map(i => ("live", i.toDouble))
    val r = Evt.gpdTail((const ++ live).toDF("g", "v"), "g", "v",
      q = 0.9).collect().map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("const", "live"))
    assert(r("const").getAs[Long]("n_exceed") == 0L)
    assert(r("const").isNullAt(r("const").fieldIndex("xi")))
    assert(r("const").isNullAt(r("const").fieldIndex("mean_excess")))
    assert(r("live").getAs[Long]("n_exceed") == 10L)
  }

  test("blandAltman + iccOneWay: a constant offset is pure bias " +
    "with tight limits; subject-dominated variance gives high ICC") {
    val pairs = (1 to 50).map(i =>
      ("g", i.toDouble, i + 3.0 + (if (i % 2 == 0) 0.1 else -0.1)))
    val ba = Agreement.blandAltman(pairs.toDF("g", "a", "b"),
      "g", "a", "b").head()
    assert(ba.getAs[Double]("bias") == 3.0)
    assert(ba.getAs[Double]("sd_diff") < 0.11)
    // subjects far apart, ratings tight -> ICC near 1
    val ratings = (1 to 20).flatMap(s =>
      (1 to 4).map(j => (s.toLong, s * 100.0 + j)))
    val icc = Agreement.iccOneWay(ratings.toDF("s", "v"), "s", "v")
      .head()
    assert(icc.getAs[Double]("k0") == 4.0)
    assert(icc.getAs[Double]("icc") > 0.99)
  }

  test("tostEquivalence: a tiny true difference is declared " +
    "equivalent at a wide margin but not at a narrow one") {
    val rows = (1 to 200).flatMap { i =>
      val noise = (i % 7) - 3.0
      Seq(("s", "A", 50.0 + noise), ("s", "B", 50.5 + noise))
    }
    val wide = Inference.tostEquivalence(rows.toDF("s", "g", "v"),
      "s", "g", "v", "A", "B", margin = 3.0).head()
    val narrow = Inference.tostEquivalence(rows.toDF("s", "g", "v"),
      "s", "g", "v", "A", "B", margin = 0.2).head()
    assert(wide.getAs[Boolean]("equivalent"))
    assert(!narrow.getAs[Boolean]("equivalent"))
    assert(wide.getAs[Double]("p_tost") < 0.05)
  }
}
