package graft.de

import graft.SparkSuite

class KmSummarySpec extends SparkSuite {
  import spark.implicits._

  test("kmSummary: hand-computed median and RMST") {
    // subjects (dur, ev): (1,1) (2,1) (3,1) (4,0)
    // KM: t=1 S=0.75; t=2 S=0.5; t=3 S=0.25; t=4 S=0.25 (censor)
    // median = min t with S <= 0.5 → 2, s_at_median 0.5
    // RMST = 1*1 + 0.75*(2-1) + 0.5*(3-2) + 0.25*(4-3) = 2.5
    val df = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 0)).toDF("dur", "ev")
    val r = Survival.kmSummary(df, "dur", "ev")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r == ((4L, 4L, 2L, 0.5, 2.5)))
  }

  test("kmSummary: curve that never crosses 0.5 has null median") {
    // (5,0) (6,0) (7,1): S = 1, 1, 0 at t=7? risk at 7 is 1 → S drops
    // to 0 → median 7. Use lighter: (5,0)(6,0): no events → S stays 1
    val df = Seq((5L, 0), (6L, 0)).toDF("dur", "ev")
    val r = Survival.kmSummary(df, "dur", "ev")
      .as[(Long, Long, Option[Long], Option[Double], Double)].head()
    assert(r._3.isEmpty && r._4.isEmpty)
    // RMST = 5 (first time) + 1.0*(6-5) = 6
    assert(r._5 == 6.0)
  }
}
