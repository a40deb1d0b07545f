package graft.events

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
    (2L, ts("2024-01-01 10:10:00"), 7L, "view", 2.0),   // same session (10m)
    (3L, ts("2024-01-01 11:30:00"), 7L, "click", 3.0),  // new session (80m gap)
    (4L, ts("2024-01-01 10:05:00"), 8L, "click", 4.0),
    (5L, ts("2024-01-01 10:05:30"), 8L, "click", 5.0)   // same minute dup
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sessionization splits on gap > 30min") {
    val s = Sessionize.sessions(events, "ts", "user_id", "value", 1800L)
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events", "total_value")
      .as[(Long, Long, Long, Double)].collect()
    assert(s.toSeq == Seq((7L, 1L, 2L, 3.0), (7L, 2L, 1L, 3.0),
      (8L, 1L, 2L, 9.0)))
  }

  test("session duration is exact in seconds") {
    val s = Sessionize.sessions(events, "ts", "user_id", "value", 1800L)
      .filter($"user_id" === 7L && $"session_seq" === 1L)
      .select("duration_sec").as[Double].collect()
    assert(s.toSeq == Seq(600.0))
  }

  test("duration_us is the exact long and snap-divides on a .xx5 total") {
    // Two sessions whose true total duration is 0.695 s — exactly
    // half-way at 2 dp. Float summing 0.35 + 0.345 gives
    // 0.6950000000000001 (rounds UP by luck of the ulp); the exact-µs
    // path must give floor((695000 + 5000)/10000)/100 = 0.70
    // deterministically, independent of sum order (the sf1-skew q17
    // class).
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, Timestamp.valueOf("2024-01-01 10:00:00.35"), 1L, "a", 0.0),
      (3L, ts("2024-01-01 12:00:00"), 1L, "a", 0.0),
      (4L, Timestamp.valueOf("2024-01-01 12:00:00.345"), 1L, "a", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val s = Sessionize.sessions(e, "ts", "user_id", "value", 1800L)
    val us = s.orderBy("session_seq").select("duration_us")
      .as[Long].collect().toSeq
    assert(us == Seq(350000L, 345000L))
    val snapped = s.groupBy($"user_id")
      .agg((floor((sum($"duration_us") + lit(5000L)) / lit(10000L)) / 100.0)
        .as("total_duration_sec"))
      .select("total_duration_sec").as[Double].collect().toSeq
    assert(snapped == Seq(0.7))
  }

  test("tumbling hourly window groups by bucket and type") {
    val t = Sessionize.tumbling(events, "ts", "event_type", "value", "hour")
      .orderBy("bucket", "event_type")
      .select("bucket", "event_type", "n_events", "sum_value")
      .as[(String, String, Long, Double)].collect()
    assert(t.toSeq == Seq(
      ("2024-01-01 10:00:00", "click", 3L, 10.0),
      ("2024-01-01 10:00:00", "view", 1L, 2.0),
      ("2024-01-01 11:00:00", "click", 1L, 3.0)))
  }

  test("dedupWithinWindow keeps earliest per (user, type, minute)") {
    val d = Sessionize.dedupWithinWindow(events, "ts", "user_id", "event_type")
      .select("event_id").as[Long].collect().sorted
    assert(d.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("topPaths: ordered k-prefix paths counted across keys") {
    // user 7: click>view>click; user 8: click>click; user 9 mirrors
    // user 8's prefix exactly -> that path counts 2.
    val more = events.unionByName(Seq(
      (6L, ts("2024-01-01 09:00:00"), 9L, "click", 0.0),
      (7L, ts("2024-01-01 09:01:00"), 9L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"))
    val got = Sessionize.topPaths(more, "user_id", "ts", "event_type",
        k = 3, topN = 10, tieBreak = Seq("event_id"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("click>click", 2L), ("click>view>click", 1L)))
  }

  test("transitionMatrix: bigram counts and row-normalized probabilities") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b", 0.0),
      (3L, ts("2024-01-01 10:02:00"), 1L, "a", 0.0),
      (4L, ts("2024-01-01 10:03:00"), 1L, "c", 0.0),
      (5L, ts("2024-01-01 09:00:00"), 2L, "a", 0.0),
      (6L, ts("2024-01-01 09:05:00"), 2L, "b", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.transitionMatrix(e, "user_id", "ts", "event_type",
        tieBreak = Seq("event_id"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // From a: a->b twice, a->c once. From b: b->a once. No cross-user
    // bigram (user 2's trail ends at b).
    assert(got == Map(
      ("a", "b") -> ((2L, 0.6667)), ("a", "c") -> ((1L, 0.3333)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("topPaths: k truncates, tie-break pins equal timestamps") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 10:00:00"), 1L, "b", 0.0),  // same ts: id order
      (3L, ts("2024-01-01 10:01:00"), 1L, "c", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.topPaths(e, "user_id", "ts", "event_type",
        k = 2, topN = 5, tieBreak = Seq("event_id"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b", 1L)))
  }
}
