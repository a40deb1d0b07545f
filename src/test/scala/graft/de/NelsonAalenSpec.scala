package graft.de

import graft.SparkSuite

class NelsonAalenSpec extends SparkSuite {
  import spark.implicits._

  test("nelsonAalen: hand-computed hazard with censoring") {
    // durations (ev): 1(1), 1(1), 2(0), 3(1), 5(0)
    // t=1: n_risk 5, d 2 → H = 0.4
    // t=2: n_risk 3, d 0 → H = 0.4
    // t=3: n_risk 2, d 1 → H = 0.9
    // t=5: n_risk 1, d 0 → H = 0.9
    val df = Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1), (5L, 0))
      .toDF("dur", "ev")
    val r = Survival.nelsonAalen(df, "dur", "ev")
      .orderBy("t")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(r.map(x => (x._1, x._2, x._3, x._4, x._5)).toSeq == Seq(
      (1L, 5L, 2L, 0L, 0.4), (2L, 3L, 0L, 1L, 0.4),
      (3L, 2L, 1L, 0L, 0.9), (5L, 1L, 0L, 1L, 0.9)))
    assert(r(0)._6 == math.rint(math.exp(-0.4) * 1e6) / 1e6)
    assert(r(2)._6 == math.rint(math.exp(-0.9) * 1e6) / 1e6)
  }

  test("nelsonAalen: all events at one time exhausts the risk set") {
    val df = Seq((2L, 1), (2L, 1), (2L, 1)).toDF("dur", "ev")
    val r = Survival.nelsonAalen(df, "dur", "ev")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(r._1 == 2L && r._2 == 3L && r._3 == 3L && r._5 == 1.0)
  }
}
