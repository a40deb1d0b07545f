package graft.events

import java.sql.Timestamp

import graft.SparkSuite

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // u1: full ordered funnel; u2: purchase BEFORE click (stops at click);
  // u3: click before signup (click doesn't count; stops at signup);
  // u4: never signed up (absent entirely, purchase notwithstanding)
  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "signup"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    (2L, ts("2024-01-01 10:00:00"), "signup"),
    (2L, ts("2024-01-01 09:00:00"), "purchase"),
    (2L, ts("2024-01-01 10:05:00"), "click"),
    (3L, ts("2024-01-01 10:00:00"), "click"),
    (3L, ts("2024-01-01 11:00:00"), "signup"),
    (4L, ts("2024-01-01 10:00:00"), "purchase")
  ).toDF("user_id", "ts", "event_type")

  test("ordering constraint: only strictly-later stages count") {
    val got = Funnel.funnelCounts(events, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .select("stage_idx", "stage", "n_entities", "conversion")
      .as[(Int, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1, "signup", 3L, 1.0),       // u1, u2, u3
      (2, "click", 2L, 0.6667),     // u1, u2 (u3's click predates signup)
      (3, "purchase", 1L, 0.3333))) // u1 only (u2's purchase predates click)
  }

  test("stageTimes: reach times are the chained minima, nulls after drop-off") {
    val got = Funnel.stageTimes(events, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .select("user_id", "__t0", "__t1", "__t2")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 10:05:00")), Some(ts("2024-01-01 10:10:00")))))
    assert(got(2L)._3.isEmpty && got(2L)._2.nonEmpty)
    assert(got(3L) == ((Some(ts("2024-01-01 11:00:00")), None, None)))
    assert(!got.contains(4L))
  }

  test("conversionLatency: per-transition stats over converting users only") {
    val got = Funnel.conversionLatency(events, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .select("stage_idx", "stage", "n_converted", "median_sec", "avg_sec",
        "max_sec")
      .as[(Int, String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // u1 and u2 convert to click in 300s each; only u1 purchases (+300s)
    assert(got(2) == ((2, "click", 2L, Some(300.0), Some(300.0), Some(300.0))))
    assert(got(3) == ((3, "purchase", 1L, Some(300.0), Some(300.0), Some(300.0))))
    // a funnel where nobody converts the last hop: null latencies, 0 count
    val noBuy = events.filter($"event_type" =!= "purchase")
    val empty = Funnel.conversionLatency(noBuy, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .filter($"stage_idx" === 3)
      .select("n_converted", "median_sec")
      .as[(Long, Option[Double])].head()
    assert(empty == ((0L, None)))
  }

  test("equal timestamps do not count as progression (strictly after)") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelCounts(ev, "user_id", "event_type", "ts",
        Seq("signup", "click"))
      .select("stage_idx", "n_entities").as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 1L, 2 -> 0L))
  }
}
