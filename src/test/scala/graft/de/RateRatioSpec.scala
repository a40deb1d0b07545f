package graft.de

import graft.SparkSuite

class RateRatioSpec extends SparkSuite {
  import spark.implicits._

  test("rateRatio: hand-computed two-cohort comparison") {
    // a: 4 events / 100 units; b: 1 event / 100 units
    // rr = 4; z = ln(4)/sqrt(1/4 + 1) = 1.3863/1.1180 = 1.24
    val rows = (1 to 100).map(i => ("a", i <= 4)) ++
      (1 to 100).map(i => ("b", i <= 1))
    val r = Experiment.rateRatio(rows.toDF("g", "e"), "g", "a", "b", "e")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double, Double)]
      .head()
    assert(r._1 == 4L && r._2 == 100L && r._3 == 1L && r._4 == 100L)
    assert(r._5 == 0.04 && r._6 == 0.01 && r._7 == 4.0)
    val z = math.log(4.0) / math.sqrt(0.25 + 1.0)
    assert(r._8 == math.rint(z * 1e4) / 1e4)
    val p = org.apache.commons.math3.special.Erf.erfc(z / math.sqrt(2.0))
    assert(math.abs(r._9 - p) < 1e-6)
  }

  test("rateRatio: zero events in a cohort yields null z and p") {
    val rows = Seq(("a", true), ("a", false), ("b", false), ("b", false))
    val r = Experiment.rateRatio(rows.toDF("g", "e"), "g", "a", "b", "e")
      .as[(Long, Long, Long, Long, Double, Double, Option[Double],
        Option[Double], Option[Double])].head()
    assert(r._1 == 1L && r._3 == 0L && r._8.isEmpty && r._9.isEmpty)
  }
}
