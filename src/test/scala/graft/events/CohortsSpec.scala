package graft.events

import java.sql.Timestamp

import graft.SparkSuite

class CohortsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("weeklyRetention: hand-checked cohort matrix") {
    // 2024-01-01 is a Monday. u1 first week 0, active weeks 0 and 1;
    // u2 first week 0, active week 0 only; u3 first week 1, active
    // weeks 1 and 2.
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-08 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-09 10:00:00")), (3L, ts("2024-01-16 10:00:00"))
    ).toDF("user_id", "ts")
    val got = Cohorts.weeklyRetention(events, "user_id", "ts")
      .select("cohort_week", "week_offset", "n_cohort", "n_active",
        "retention")
      .as[(Timestamp, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val w0 = ts("2024-01-01 00:00:00")
    val w1 = ts("2024-01-08 00:00:00")
    assert(got((w0, 0L)) == ((2L, 2L, 1.0)))
    assert(got((w0, 1L)) == ((2L, 1L, 0.5)))
    assert(got((w1, 0L)) == ((1L, 1L, 1.0)))
    assert(got((w1, 1L)) == ((1L, 1L, 1.0)))
    assert(got.size == 4)
  }

  test("newVsReturning: first-day users are new, repeats return, " +
    "multiple same-day events count once") {
    val df = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 09:00:00"),
      (2L, "2024-01-01 10:00:00"),
      (1L, "2024-01-02 08:00:00"),
      (3L, "2024-01-02 09:00:00"))
      .toDF("u", "ts0")
      .select($"u", $"ts0".cast("timestamp").as("ts"))
    val got = Cohorts.newVsReturning(df, "u", "ts").collect()
      .map(r => r.getDate(0).toString ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_returning"), r.getAs[Double]("new_share"))))
      .toMap
    assert(got("2024-01-01") == ((2L, 2L, 0L, 1.0)))
    assert(got("2024-01-02") == ((2L, 1L, 1L, 0.5)))
  }
}
