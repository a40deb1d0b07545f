package graft.events

import java.sql.Timestamp

import graft.SparkSuite

class AnomalySpec extends SparkSuite {
  import spark.implicits._

  test("hourlyRateAnomalies: spike flagged against trailing baseline, " +
    "warm-up has no defined baseline") {
    // one type, 30 hours: 29 steady hours of ~4 events (counts 4,4,4,3
    // repeating keeps sd > 0) and one 40-event spike at hour 27
    val rows = (0 until 30).flatMap { h =>
      val n = if (h == 27) 40 else if (h % 4 == 3) 3 else 4
      (0 until n).map(i =>
        ("err", Timestamp.valueOf(f"2024-01-01 $h%02d:${i % 60}%02d:00")))
    }
    val events = rows.toDF("event_type", "ts")
    val got = Anomaly.hourlyRateAnomalies(events, "event_type", "ts")
      .select("bucket_ts", "n", "z", "is_anomaly")
      .as[(Timestamp, Long, Option[Double], Boolean)].collect()
      .map(r => r._1.toLocalDateTime.getHour + 24 *
        (r._1.toLocalDateTime.getDayOfMonth - 1) -> ((r._2, r._3, r._4)))
      .toMap
    // hour 0: no trailing rows -> null z, not anomalous
    assert(got(0)._2.isEmpty && !got(0)._3)
    // hour 27 spike: z far above 3
    assert(got(27)._1 == 40L && got(27)._2.exists(_ > 3.0) && got(27)._3)
    // steady hours after warm-up: not anomalous
    assert((5 to 26).forall(h => !got(h)._3))
    // the hour AFTER the spike compares against a baseline containing
    // the spike - still not anomalous (documented trailing semantics)
    assert(!got(28)._3)
  }

  test("seasonalRateAnomalies: same-hour profile flags the off-profile day") {
    import java.sql.Timestamp
    // hour 03:00 across 15 days: 10 events each; day 16 carries 100.
    // Self-inclusive z is bounded by ~sqrt(buckets), so 16 days are
    // needed before a single spike can clear the 3.0 cut (z = 3.75
    // here) — the bound itself is the documented self-inclusion trade.
    // A different hour (12:00) is steady and never flags.
    val rows = (1 to 16).flatMap { d =>
      val n3 = if (d == 16) 100 else 10
      (0 until n3).map(i =>
        ("e", Timestamp.valueOf(f"2024-01-$d%02d 03:${i % 60}%02d:00"))) ++
        (0 until 10).map(i =>
          ("e", Timestamp.valueOf(f"2024-01-$d%02d 12:${i % 60}%02d:00")))
    }
    val got = Anomaly.seasonalRateAnomalies(rows.toDF("event_type", "ts"),
        "event_type", "ts")
      .select("bucket_ts", "hod", "n", "is_anomaly")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val flagged = got.filter(_._4)
    assert(flagged.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq(("2024-01-16 03:00:00.0", 3L, 100L)))
    assert(got.count(_._2 == 12L) == 16 && got.filter(_._2 == 12L).forall(!_._4))
  }

  test("seasonalRateAnomalies: zero-spread and single-bucket hours flag false") {
    import java.sql.Timestamp
    val rows = Seq(
      // hod 5 appears on one day only -> stddev null -> false, null z
      ("e", Timestamp.valueOf("2024-01-01 05:00:00")),
      // hod 6 twice with identical counts -> sd = 0 -> false
      ("e", Timestamp.valueOf("2024-01-01 06:00:00")),
      ("e", Timestamp.valueOf("2024-01-02 06:00:00")))
    val got = Anomaly.seasonalRateAnomalies(rows.toDF("event_type", "ts"),
        "event_type", "ts")
      .select("hod", "z", "is_anomaly").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(2)))
    assert(got.forall { case (_, z, fl) => z.isEmpty && !fl })
  }

  test("hampel: a lone spike is the only outlier; flat windows give " +
    "zero MAD and never flag their own center") {
    import spark.implicits._
    val s = Seq(10, 10, 10, 100, 10, 10, 10).zipWithIndex
      .map { case (x, t) => ("g", t, x) }.toDF("g", "t", "x")
    val got = Anomaly.hampel(s, "g", "t", "x", halfWindow = 2)
      .collect().map(r => r.getInt(1) ->
        ((r.getAs[Double]("roll_med"), r.getAs[Double]("roll_mad"),
          r.getAs[Boolean]("is_outlier")))).toMap
    assert(got(3) == ((10.0, 0.0, true)))   // the spike
    assert(got.filter(_._2._3).keySet == Set(3))
    assert(got(0) == ((10.0, 0.0, false)))
  }

  test("hampel: faithful center-median MAD (not stacked rolling " +
    "medians)") {
    import spark.implicits._
    // window around i=2 (1-based 3rd): values 1,2,9,2,1 -> med 2,
    // MAD about THAT med = median(1,0,7,0,1) = 1 -> |9-2|=7 > 3*1.4826
    val s = Seq(1, 2, 9, 2, 1).zipWithIndex
      .map { case (x, t) => ("g", t, x) }.toDF("g", "t", "x")
    val got = Anomaly.hampel(s, "g", "t", "x", halfWindow = 2)
      .collect().map(r => r.getInt(1) ->
        ((r.getAs[Double]("roll_med"), r.getAs[Double]("roll_mad"),
          r.getAs[Boolean]("is_outlier")))).toMap
    assert(got(2) == ((2.0, 1.0, true)))
  }
}
