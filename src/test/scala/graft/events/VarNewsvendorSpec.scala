package graft.events

import graft.SparkSuite

class VarNewsvendorSpec extends SparkSuite {
  import spark.implicits._

  test("varBacktest: a calibrated tail passes, a regime break fails") {
    // estimation half 1..100; test half identical -> ~5% violations
    val calm = (1 to 100).map(i => ("ok", i, i.toDouble)) ++
      (101 to 200).map(i => ("ok", i, (i - 100).toDouble))
    // test half shifted down -> way more than 5% below VaR
    val crash = (1 to 100).map(i => ("bad", i, i.toDouble)) ++
      (101 to 200).map(i => ("bad", i, (i - 100) / 10.0))
    val r = Finance.varBacktest((calm ++ crash).toDF("g", "b", "v"),
      "g", "b", "v", p = 0.05).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("ok").getAs[Long]("n_est") == 100L)
    assert(r("ok").getAs[Double]("p_value") > 0.05)
    assert(r("bad").getAs[Long]("n_violations") > 50L)
    assert(r("bad").getAs[Double]("p_value") < 1e-6)
  }

  test("varBacktest: zero violations takes the x ln x limit, not NaN") {
    val up = (1 to 40).map(i => ("u", i, i.toDouble)) ++
      (41 to 80).map(i => ("u", i, 1000.0 + i))
    val r = Finance.varBacktest(up.toDF("g", "b", "v"),
      "g", "b", "v", p = 0.05).head()
    assert(r.getAs[Long]("n_violations") == 0L)
    assert(!r.getAs[Double]("lr_pof").isNaN)
    assert(r.getAs[Double]("p_value") > 0 &&
      r.getAs[Double]("p_value") <= 1)
  }

  test("newsvendor: critical-ratio quantile and empirical costs") {
    // demand 1..10, cu=co=1 -> r=0.5 -> Q = median 5.5
    val d = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "d")
    val r = graft.report.Inventory.newsvendor(d, "g", "d", 1.0, 1.0)
      .head()
    assert(r.getAs[Double]("critical_ratio") == 0.5)
    assert(r.getAs[Double]("q_opt") == 5.5)
    // E(D-5.5)+ = (0.5+1.5+2.5+3.5+4.5)/10 = 1.25 = E(5.5-D)+
    assert(r.getAs[Double]("exp_underage") == 1.25)
    assert(r.getAs[Double]("exp_overage") == 1.25)
    assert(r.getAs[Double]("exp_cost") == 2.5)
  }
}
