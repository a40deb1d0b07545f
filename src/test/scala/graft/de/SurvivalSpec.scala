package graft.de

import graft.SparkSuite

class SurvivalSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed KM with censoring (classic 6-subject example)") {
    // durations (event): 1(d), 2(c), 3(d), 4(c), 5(d), 6(c)
    val df = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 0), (5L, 1), (6L, 0))
      .toDF("dur", "ev")
    val m = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getAs[Long]("t") -> r).toMap
    assert(m(1L).getAs[Long]("n_risk") == 6L)
    assert(m(1L).getAs[Double]("survival") == math.rint(5.0 / 6 * 1e6) / 1e6)
    // t=3: at risk 4, S = 5/6 · 3/4 = 0.625
    assert(m(3L).getAs[Long]("n_risk") == 4L)
    assert(m(3L).getAs[Double]("survival") == 0.625)
    // t=5: at risk 2, S = 0.625 · 1/2 = 0.3125
    assert(m(5L).getAs[Double]("survival") == 0.3125)
    // censor-only times keep the previous survival
    assert(m(2L).getAs[Double]("survival") ==
      m(1L).getAs[Double]("survival"))
    assert(m(6L).getAs[Long]("n_event") == 0L)
  }

  test("no events at all: survival stays 1.0 everywhere") {
    val df = Seq((3L, 0), (5L, 0), (5L, 0)).toDF("dur", "ev")
    val rows = Survival.kaplanMeier(df, "dur", "ev").collect()
    assert(rows.forall(_.getAs[Double]("survival") == 1.0))
    assert(rows.map(_.getAs[Long]("n_censored")).sum == 3L)
  }

  test("everyone dies at the last time: survival hits exactly 0") {
    val df = Seq((1L, 0), (2L, 1), (2L, 1)).toDF("dur", "ev")
    val m = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getAs[Long]("t") -> r.getAs[Double]("survival")).toMap
    assert(m(1L) == 1.0)
    assert(m(2L) == 0.0)
  }

  test("ties at one duration combine into one step") {
    // 4 subjects: two die at t=2 together, at-risk 4 → S = 2/4
    val df = Seq((2L, 1), (2L, 1), (3L, 0), (4L, 0)).toDF("dur", "ev")
    val m = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getAs[Long]("t") -> r).toMap
    assert(m(2L).getAs[Long]("n_event") == 2L)
    assert(m(2L).getAs[Long]("n_risk") == 4L)
    assert(m(2L).getAs[Double]("survival") == 0.5)
  }
}
