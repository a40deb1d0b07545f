package graft.de

import graft.SparkSuite

class DagostinoMdeSpec extends SparkSuite {
  import spark.implicits._

  test("dagostinoK2: normaltest-formula parity on a fixed sample") {
    // x = [1..20, 50], hand-walked through the D'Agostino/Anscombe
    // forms -> K2 = 27.9790, p = 8.4e-07
    val xs = (1 to 20).map(_.toDouble) :+ 50.0
    val r = Moments.dagostinoK2(xs.map(("g", _)).toDF("g", "v"),
      "g", "v").head()
    assert(r.getAs[Double]("k2") == 27.979)
    assert(r.getAs[Double]("p_value") == 1e-6) // rounded 6dp
    // normal grid accepts
    val nd = new org.apache.commons.math3.distribution
      .NormalDistribution(0.0, 1.0)
    val grid = (1 to 100).map(i =>
      ("n", nd.inverseCumulativeProbability((i - 0.5) / 100.0)))
    val ok = Moments.dagostinoK2(grid.toDF("g", "v"), "g", "v").head()
    assert(ok.getAs[Double]("p_value") > 0.1)
  }

  test("dagostinoK2: n < 20 drops out") {
    val df = (1 to 19).map(i => ("s", i.toDouble)).toDF("g", "v")
    assert(Moments.dagostinoK2(df, "g", "v").count() == 0)
  }

  test("mdeAtCurrentTraffic: quadrupling traffic halves the MDE; " +
    "degenerate rates yield null") {
    val small = (1 to 400).map(i => ("s", if (i % 5 == 0) 1 else 0))
    val big = (1 to 1600).map(i => ("b", if (i % 5 == 0) 1 else 0))
    val allOne = (1 to 100).map(_ => ("one", 1))
    val r = Experiment.mdeAtCurrentTraffic(
      (small ++ big ++ allOne).toDF("g", "x"), "g", "x")
      .collect().map(x => x.getString(0) -> x).toMap
    val ratio = r("s").getAs[Double]("mde_abs") /
      r("b").getAs[Double]("mde_abs")
    assert(math.abs(ratio - 2.0) < 0.01)
    assert(r("one").isNullAt(r("one").fieldIndex("mde_abs")))
    assert(r("s").getAs[Double]("base_rate") == 0.2)
  }

  test("banditRegret: the best arm carries zero regret and shares " +
    "sum to 1") {
    val pulls = Seq.fill(100)(("good", 10.0)) ++
      Seq.fill(50)(("bad", 6.0)) ++ Seq.fill(50)(("worse", 2.0))
    val r = Experiment.banditRegret(pulls.toDF("arm", "rwd"),
      "arm", "rwd").collect().map(x => x.getString(0) -> x).toMap
    assert(r("good").getAs[Double]("regret") == 0.0)
    assert(r("bad").getAs[Double]("regret") == 200.0)  // 50 * 4
    assert(r("worse").getAs[Double]("regret") == 400.0)
    assert(r("bad").getAs[Double]("total_regret") == 600.0)
    assert(r.values.map(_.getAs[Double]("regret_share")).sum == 1.0)
  }
}
