package graft.report

import graft.SparkSuite

class ContributionSpec extends SparkSuite {
  import spark.implicits._

  test("pareto: shares, cumulative shares, threshold-crossing flag") {
    // 50 + 30 + 15 + 5 = 100. Cum: 0.5, 0.8, 0.95, 1.0. With 0.8:
    // rows whose PRIOR cum < 0.8 are in: 50 (0<80), 30 (50<80),
    // 15 (80<80 false) -> first two plus none after.
    val df = Seq(("a", 50.0), ("b", 30.0), ("c", 15.0), ("d", 5.0))
      .toDF("k", "v")
    val got = Contribution.pareto(df, Seq("k"), "v")
      .as[(String, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(got("a") == ((0.5, 0.5, true)))
    assert(got("b") == ((0.3, 0.8, true)))
    assert(got("c") == ((0.15, 0.95, false)))
    assert(got("d") == ((0.05, 1.0, false)))
  }

  test("pareto: ties broken by key, cents rounding exact") {
    val df = Seq(("b", 0.1), ("a", 0.1), ("c", 0.2)).toDF("k", "v")
    val got = Contribution.pareto(df, Seq("k"), "v")
      .as[(String, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map("c" -> 0.5, "a" -> 0.75, "b" -> 1.0))
  }
}
