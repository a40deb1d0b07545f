package graft.events

import graft.SparkSuite

class TimeWeightedSpec extends SparkSuite {
  import spark.implicits._

  test("trapezoidalMean weights samples by holding time, not count") {
    // key 1: value 0 held from t=0..10, then burst of 100s at t=10,11,12.
    // trapezoids: (0+0)/2·10? — samples: (0,0),(10,100),(11,100),(12,100)
    //   [0,10]: (0+100)/2·10 = 500; [10,11]: 100; [11,12]: 100 → 700/12
    // arithmetic mean would be 75 — the burst dominating wrongly.
    val df = Seq(
      (1L, 0L, 0.0, 1L), (1L, 10L, 100.0, 2L),
      (1L, 11L, 100.0, 3L), (1L, 12L, 100.0, 4L),
      // key 2: single sample → zero-width support, dropped
      (2L, 5L, 42.0, 5L),
      // key 3: two samples at the same instant → dropped
      (3L, 7L, 1.0, 6L), (3L, 7L, 9.0, 7L))
      .toDF("k", "t", "v", "id")
    val got = TimeWeighted.trapezoidalMean(df, "k", "t", "v", "id")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((1L, math.rint(700.0 / 12 * 1e4) / 1e4, 4L)))
  }

  test("simultaneous samples order by the tie-break deterministically") {
    // two samples at t=0 (values 0 and 10, ids 1 then 2), one at t=10:
    // segments (0→0-width), (10 value from id 2 → t=10): (10+20)/2·10=150
    val df = Seq((1L, 0L, 0.0, 1L), (1L, 0L, 10.0, 2L), (1L, 10L, 20.0, 3L))
      .toDF("k", "t", "v", "id")
    val got = TimeWeighted.trapezoidalMean(df, "k", "t", "v", "id")
      .as[(Long, Double, Long)].collect().toSeq
    // trapezoids: [0,0] (0+10)/2·0 = 0; [0,10] (10+20)/2·10 = 150 → 15.0
    assert(got == Seq((1L, 15.0, 3L)))
  }
}
