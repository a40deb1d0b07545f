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
}
