package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.md5

import graft.SparkSuite
import graft.streaming.EventStream.Event

class EventStreamSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runToMemory(df: org.apache.spark.sql.DataFrame,
                          name: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-ck-$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming tumbling window matches batch aggregation once watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 10:05:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:20:00"), 7, "click", 2.0),
      Event(3, ts("2024-01-01 10:40:00"), 8, "view", 3.0),
      Event(4, ts("2024-01-01 11:10:00"), 7, "click", 4.0))
    // flush event: advances the watermark far past the 10:00 and 11:00
    // windows so append mode emits them
    in.addData(Event(99, ts("2024-01-02 00:00:00"), 9, "flush", 0.0))

    runToMemory(EventStream.tumblingCounts(in.toDF(), "1 hour", "10 minutes"),
      "tumbling")
    val got = spark.table("tumbling")
      .select("bucket", "event_type", "n_events", "sum_value", "avg_value")
      .as[(String, String, Long, Double, Double)].collect().toSet
    assert(got.contains(("2024-01-01 10:00:00", "click", 2L, 3.0, 1.5)))
    assert(got.contains(("2024-01-01 10:00:00", "view", 1L, 3.0, 3.0)))
    assert(got.contains(("2024-01-01 11:00:00", "click", 1L, 4.0, 4.0)))
    // schema identical to the batch twin -> direct set-equality, no
    // reconciliation
    val batch = graft.events.Sessionize.tumbling(
        spark.createDataFrame(Seq(
          Event(1, ts("2024-01-01 10:05:00"), 7, "click", 1.0),
          Event(2, ts("2024-01-01 10:20:00"), 7, "click", 2.0),
          Event(3, ts("2024-01-01 10:40:00"), 8, "view", 3.0),
          Event(4, ts("2024-01-01 11:10:00"), 7, "click", 4.0))),
        "ts", "event_type", "value", "hour")
      .as[(String, String, Long, Double, Double)].collect().toSet
    assert(batch.subsetOf(got))
  }

  test("dropDuplicatesWithinWatermark keeps one row per (user, type, minute)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 10:05:10"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:05:40"), 7, "click", 2.0),   // same minute dup
      Event(3, ts("2024-01-01 10:06:10"), 7, "click", 3.0),   // next minute
      Event(4, ts("2024-01-01 10:05:20"), 8, "click", 4.0))   // other user

    runToMemory(EventStream.dedupWithinWatermark(in.toDF(), "10 minutes"),
      "streamdedup")
    val got = spark.table("streamdedup").select("event_id")
      .as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L, 4L))
  }

  test("stateful sessionization: next-session close + event-time timeout close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 7, "view", 2.0),
      Event(3, ts("2024-01-01 11:30:00"), 7, "click", 3.0))  // 80-min gap
    // watermark-advancing event: pushes event time past 11:30 + gap so
    // user 7's open session times out and is emitted
    in.addData(Event(99, ts("2024-01-02 00:00:00"), 9, "flush", 0.0))

    val out = EventStream.sessionize(in.toDS(), gapSeconds = 1800L)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-sess").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions")
      .select("user_id", "session_seq", "n_events", "duration_sec", "total_value")
      .as[(Long, Long, Long, Double, Double)].collect()
      .filter(_._1 == 7L).toSet
    // session 1 (2 events, 600 s, value 3.0) closed by session 2's
    // arrival; session 2 (1 event, 0 s) closed by the event-time timeout
    assert(got == Set((7L, 1L, 2L, 600.0, 3.0), (7L, 2L, 1L, 0.0, 3.0)))
  }

  test("sub-millisecond timestamps: streaming sessions equal batch sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Two events exactly gap + 500µs apart: with ms-truncated event time
    // the gap reads as exactly `gap` (same session); with full µs
    // precision it exceeds the gap and splits into two sessions. The
    // batch twin uses unix_micros, so only the µs reading agrees.
    val gap = 30L
    val e1 = ts("2024-01-01 10:00:00"); e1.setNanos(499000)   // +499 µs (0 ms)
    val e2 = ts("2024-01-01 10:00:30"); e2.setNanos(999000)   // +999 µs (0 ms)
    // µs gap = 30.000500 s > gap (split); ms-truncated gap = 30.000 s
    // (no split) — so this case catches any ms truncation.
    val events = Seq(
      Event(1, e1, 7, "click", 1.0),
      Event(2, e2, 7, "click", 2.0))

    val batch = graft.events.Sessionize
      .sessions(events.toDF(), "ts", "user_id", "value", gap)
      .select($"user_id", $"session_seq".cast("long"), $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch == Set((7L, 1L, 1L), (7L, 2L, 1L)), s"batch=$batch")

    val in = MemoryStream[Event]
    in.addData(events: _*)
    in.addData(Event(99, ts("2024-01-02 00:00:00"), 9, "flush", 0.0))
    val out = EventStream.sessionize(in.toDS(), gapSeconds = gap)
    val q = out.writeStream.format("memory").queryName("subms")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-subms").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("subms")
      .select("user_id", "session_seq", "n_events")
      .as[(Long, Long, Long)].collect().filter(_._1 == 7L).toSet
    assert(stream == batch, s"stream=$stream batch=$batch")
  }

  test("stream-static enrichment join keeps unmatched rows with nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "trial")).toDF("user_id", "segment")
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:00:01"), 9, "click", 2.0))   // no dim row
    runToMemory(EventStream.enrichWithDimension(in.toDF(), dim, "user_id"),
      "enriched")
    val got = spark.table("enriched")
      .select($"event_id", $"segment")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("gold"), 2L -> None))
  }

  test("narrow text operators run unchanged on a stream (quality filter)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData(
      (1L, "the quick brown fox is a fine and proper sentence of words"),
      (2L, "1 2 3 4 5 6 7 8 9 0 11 22 33 44"))
    runToMemory(
      graft.text.TextAnalysis.withQuality(
        in.toDF().toDF("doc_id", "text"), "text")
        .filter($"quality_score" >= 0.5)
        .select($"doc_id", $"quality_score"),
      "streamquality")
    val ids = spark.table("streamquality").select("doc_id").as[Long].collect()
    assert(ids.toSeq == Seq(1L), "digit-soup doc must be filtered out")
  }

  test("streaming incremental dedup: seen content drops, stream first-wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seen = Seq(Tuple1("already ingested content")).toDF("text")
      .select(md5($"text").as("content_md5"))
    val in = MemoryStream[(Long, String)]
    in.addData(
      (1L, "already ingested content"),   // in seen set -> drop
      (2L, "fresh stream content"))       // keep
    in.addData(
      (3L, "fresh stream content"),       // in-stream dup of 2 -> drop
      (4L, "another new doc"))            // keep
    runToMemory(
      EventStream.incrementalDedupStream(
        in.toDF().toDF("doc_id", "text"), "text", seen),
      "incrdedup")
    val ids = spark.table("incrdedup").select("doc_id").as[Long]
      .collect().sorted
    assert(ids.toSeq == Seq(2L, 4L))
    // batch twin agrees on the same input (min id == arrival order here)
    val batch = Seq((1L, "already ingested content"),
      (2L, "fresh stream content"), (3L, "fresh stream content"),
      (4L, "another new doc")).toDF("doc_id", "text")
    val b = graft.dedup.Dedup.incrementalExactDedup(batch, "doc_id", "text", seen)
      .select("doc_id").as[Long].collect().sorted
    assert(b.toSeq == ids.toSeq)
  }

  test("watermarked incremental dedup: in-horizon dups drop, state evicts past the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seen = Seq(Tuple1("already ingested content")).toDF("text")
      .select(md5($"text").as("content_md5"))
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = EventStream.incrementalDedupStreamWatermarked(
      in.toDF().toDF("doc_id", "ts", "text"), "text", "ts", seen,
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("wmdedup")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-wmdedup").toString)
      .start()
    // Batch 1: static-seen content drops; in-horizon re-occurrence of
    // "fresh A" (1 min apart, horizon 10 min) drops.
    in.addData(
      (1L, ts("2024-01-01 10:00:00"), "already ingested content"),
      (2L, ts("2024-01-01 10:00:00"), "fresh A"),
      (3L, ts("2024-01-01 10:01:00"), "fresh A"))
    q.processAllAvailable()
    // Batch 2: advance the watermark far past 10:00 + 10 min, evicting
    // the "fresh A" state (bounded state — the point of the variant).
    in.addData((99L, ts("2024-01-01 12:00:00"), "watermark flush doc"))
    q.processAllAvailable()
    // Batch 3: the SAME content re-occurs beyond the horizon — kept
    // in-stream (state was evicted); history-level suppression is the
    // static snapshot's job.
    in.addData((5L, ts("2024-01-01 12:30:00"), "fresh A"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("wmdedup").select("doc_id").as[Long]
      .collect().sorted
    assert(ids.toSeq == Seq(2L, 5L, 99L))
  }

  test("stream-stream attribution join matches the batch banded range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val anchors = MemoryStream[(Long, Timestamp, Long)]
    val points = MemoryStream[(Long, Timestamp, Long)]
    // user 7: clicks at 9:10 (outside 30-min window), 9:40, 9:59;
    //         purchase at 10:00 -> pairs with 9:40 + 9:59 only
    // user 8: click at exactly the purchase ts -> excluded ([start, end))
    anchors.addData((7L, ts("2024-01-01 10:00:00"), 100L),
      (8L, ts("2024-01-01 10:00:00"), 101L))
    points.addData((7L, ts("2024-01-01 09:10:00"), 1L),
      (7L, ts("2024-01-01 09:40:00"), 2L),
      (7L, ts("2024-01-01 09:59:00"), 3L),
      (8L, ts("2024-01-01 10:00:00"), 4L))
    // watermark-advancing flush rows (far future, join on nothing)
    anchors.addData((99L, ts("2024-01-02 00:00:00"), 999L))
    points.addData((98L, ts("2024-01-02 00:00:00"), 998L))

    val aDf = anchors.toDF().toDF("user_id", "a_ts", "a_id")
    val pDf = points.toDF().toDF("user_id", "p_ts", "p_id")
    runToMemory(EventStream.attributionJoinStream(aDf, pDf,
      "user_id", "a_ts", "p_ts",
      windowSec = 1800, "10 minutes", "10 minutes"), "attribution")
    val got = spark.table("attribution")
      .select("a_id", "p_id").as[(Long, Long)].collect().toSet

    // batch twin over the same rows (plain DataFrames, not the stream)
    val aBatch = Seq((7L, ts("2024-01-01 10:00:00"), 100L),
      (8L, ts("2024-01-01 10:00:00"), 101L),
      (99L, ts("2024-01-02 00:00:00"), 999L))
      .toDF("user_id", "w_end", "a_id")
      .withColumn("w_start",
        $"w_end" - org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"))
    val pBatch = Seq((7L, ts("2024-01-01 09:10:00"), 1L),
      (7L, ts("2024-01-01 09:40:00"), 2L),
      (7L, ts("2024-01-01 09:59:00"), 3L),
      (8L, ts("2024-01-01 10:00:00"), 4L),
      (98L, ts("2024-01-02 00:00:00"), 998L))
      .toDF("user_id", "p_ts", "p_id")
    val batch = graft.join.RangeJoin.bandedIntervalJoin(
        aBatch, pBatch, "user_id", "w_start", "w_end", "p_ts",
        bandWidthSec = 1800)
      .select("a_id", "p_id").as[(Long, Long)].collect().toSet

    assert(got == Set((100L, 2L), (100L, 3L)))
    assert(got == batch)
  }

  test("streaming funnel matches batch stageTimes on in-order data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // u7 full funnel; u8 purchase BEFORE click (stuck at click);
    // u9 click only (never signed up -> no rows at all)
    in.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "signup", 0.0),
      Event(2, ts("2024-01-01 10:05:00"), 7, "click", 0.0),
      Event(3, ts("2024-01-01 10:10:00"), 7, "purchase", 0.0),
      Event(4, ts("2024-01-01 10:00:00"), 8, "signup", 0.0),
      Event(5, ts("2024-01-01 09:00:00"), 8, "purchase", 0.0),
      Event(6, ts("2024-01-01 10:05:00"), 8, "click", 0.0),
      Event(7, ts("2024-01-01 10:00:00"), 9, "click", 0.0))
    in.addData(Event(99, ts("2024-01-02 00:00:00"), 99, "signup", 0.0))

    val stages = Seq("signup", "click", "purchase")
    runToMemory(
      EventStream.funnelStream(in.toDS(), stages).toDF(), "funnel_stream")
    val got = spark.table("funnel_stream")
      .filter($"user_id" < 90)
      .select("user_id", "stage_idx", "reach_ts")
      .as[(Long, Int, Timestamp)].collect().toSet

    val batchEvents = Seq(
      (7L, ts("2024-01-01 10:00:00"), "signup"),
      (7L, ts("2024-01-01 10:05:00"), "click"),
      (7L, ts("2024-01-01 10:10:00"), "purchase"),
      (8L, ts("2024-01-01 10:00:00"), "signup"),
      (8L, ts("2024-01-01 09:00:00"), "purchase"),
      (8L, ts("2024-01-01 10:05:00"), "click"),
      (9L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val batch = graft.events.Funnel.stageTimes(batchEvents, "user_id",
        "event_type", "ts", stages)
      .select($"user_id", $"__t0", $"__t1", $"__t2")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect()
      .flatMap { case (u, t0, t1, t2) =>
        Seq(t0.map((u, 1, _)), t1.map((u, 2, _)), t2.map((u, 3, _))).flatten
      }.toSet

    assert(got == batch)
    assert(got((7L, 3, ts("2024-01-01 10:10:00"))))   // full funnel emitted
    assert(!got.exists { case (u, _, _) => u == 9L }) // never signed up
  }

  test("streaming funnel: a late lower timestamp is not retroactive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStream.funnelStream(in.toDS(), Seq("signup", "click")).toDF()
      .writeStream.format("memory").queryName("funnel_stream2")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck-funnel2").toString)
      .start()
    in.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "signup", 0.0))
    q.processAllAvailable()
    // later MICRO-BATCH: an earlier signup must not re-emit or lower
    in.addData(Event(2, ts("2024-01-01 09:00:00"), 7, "signup", 0.0))
    q.processAllAvailable()
    in.addData(Event(99, ts("2024-01-02 00:00:00"), 99, "signup", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_stream2")
      .filter($"user_id" === 7)
      .select("stage_idx", "reach_ts").as[(Int, Timestamp)].collect()
    assert(got.toSeq == Seq((1, ts("2024-01-01 10:00:00"))))
  }

  test("streaming funnel: completed funnel does not re-enter within the TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStream.funnelStream(in.toDS(), Seq("signup", "click")).toDF()
      .writeStream.format("memory").queryName("funnel_stream3")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck-funnel3").toString)
      .start()
    in.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "signup", 0.0),
      Event(2, ts("2024-01-01 10:01:00"), 7, "click", 0.0))
    q.processAllAvailable()
    // repeat signup after completion, same horizon: must NOT re-emit
    in.addData(Event(3, ts("2024-01-01 10:30:00"), 7, "signup", 0.0))
    q.processAllAvailable()
    in.addData(Event(99, ts("2024-01-02 00:00:00"), 99, "signup", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_stream3").filter($"user_id" === 7)
      .select("stage_idx").as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 2))
  }

  test("streaming funnel: a repeated stage type fills every position in order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "view", 0.0),
      Event(2, ts("2024-01-01 10:01:00"), 7, "click", 0.0),
      Event(3, ts("2024-01-01 10:02:00"), 7, "view", 0.0))
    in.addData(Event(99, ts("2024-01-02 00:00:00"), 99, "view", 0.0))
    runToMemory(
      EventStream.funnelStream(in.toDS(), Seq("view", "click", "view")).toDF(),
      "funnel_repeat")
    val got = spark.table("funnel_repeat").filter($"user_id" === 7)
      .select("stage_idx", "reach_ts").as[(Int, Timestamp)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, ts("2024-01-01 10:00:00")),
      (2, ts("2024-01-01 10:01:00")),
      (3, ts("2024-01-01 10:02:00"))))
  }

  test("streaming funnel: zero-progress users store no state, still work later") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStream.funnelStream(in.toDS(), Seq("signup", "click")).toDF()
      .writeStream.format("memory").queryName("funnel_stream4")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ck-funnel4").toString)
      .start()
    // click with no signup: no emission, no state
    in.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "click", 0.0))
    q.processAllAvailable()
    // later signup + click still progress normally
    in.addData(Event(2, ts("2024-01-01 10:05:00"), 7, "signup", 0.0),
      Event(3, ts("2024-01-01 10:06:00"), 7, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_stream4").filter($"user_id" === 7)
      .select("stage_idx").as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 2))
  }

  test("sliding windows overlap: one event lands in two 60/30-min windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(Event(1, ts("2024-01-01 10:40:00"), 7, "click", 1.0))
    in.addData(Event(99, ts("2024-01-02 00:00:00"), 9, "flush", 0.0))

    runToMemory(
      EventStream.slidingCounts(in.toDF(), "1 hour", "30 minutes", "10 minutes"),
      "sliding")
    val got = spark.table("sliding")
      .filter($"event_type" === "click")
      .select("window_start").as[Timestamp].collect().toSet
    assert(got == Set(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")))
  }

  test("latestByKeyStream: out-of-order upserts converge to batch latestByKey") {
    import spark.implicits._
    import graft.streaming.EventStream.Upsert
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Upsert]
    val q = EventStream.latestByKeyStream(in.toDS())
      .writeStream.format("memory").queryName("cdc_latest")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-cdc").toString)
      .start()
    // batch 1: k1 v2 arrives BEFORE v1 (out of order); k2 v1
    in.addData(Upsert(1L, 2L, "b"), Upsert(1L, 1L, "a"), Upsert(2L, 1L, "x"))
    q.processAllAvailable()
    // batch 2: stale duplicate of k1 v2 and an older v0 — winner must
    // survive re-delivery; k2 advances
    in.addData(Upsert(1L, 2L, "b"), Upsert(1L, 0L, "z"), Upsert(2L, 3L, "y"))
    q.processAllAvailable()
    q.stop()
    // Emissions (order-free): batch 1 emits k1→(2,b) despite v2
    // arriving before v1, and k2→(1,x); batch 2 re-emits k1's winner
    // (stale re-delivery folds into the same max) and advances k2.
    val rows = spark.table("cdc_latest").as[Upsert].collect().toSeq
    assert(rows.groupBy(identity).view.mapValues(_.size).toMap == Map(
      Upsert(1L, 2L, "b") -> 2, Upsert(2L, 1L, "x") -> 1,
      Upsert(2L, 3L, "y") -> 1))
    // per-key max emission == the batch twin's winner on the same rows
    val streamed = rows.groupBy(_.key)
      .map { case (k, rs) => k -> rs.maxBy(u => (u.version, u.payload)) }
    val batch = graft.dedup.Dedup.latestByKey(
        Seq((1L, 2L, "b"), (1L, 1L, "a"), (1L, 0L, "z"),
          (2L, 1L, "x"), (2L, 3L, "y"))
          .toDF("key", "version", "payload"),
        Seq("key"), Seq("version", "payload"))
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> Upsert(r._1, r._2, r._3)).toMap
    assert(streamed == batch)
  }

  test("session_window stream: gap splits sessions; watermark emits " +
    "closed sessions with correct bounds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // user 7: two events 10 min apart (one session, gap 30m), then a
    // burst 2 hours later (second session); user 8: single event
    in.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 7, "click", 2.0),
      Event(3, ts("2024-01-01 12:30:00"), 7, "view", 4.0),
      Event(4, ts("2024-01-01 10:05:00"), 8, "view", 8.0))
    in.addData(Event(99, ts("2024-01-02 00:00:00"), 9, "flush", 0.0))
    runToMemory(EventStream.sessionWindowStream(in.toDF(), "30 minutes",
      "10 minutes"), "sessions")
    val got = spark.table("sessions")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // first session: start 10:00, end = last event + gap = 10:40
    assert(got((7L, ts("2024-01-01 10:00:00"))) ==
      ((ts("2024-01-01 10:40:00"), 2L, 3.0)))
    assert(got((7L, ts("2024-01-01 12:30:00"))) ==
      ((ts("2024-01-01 13:00:00"), 1L, 4.0)))
    assert(got((8L, ts("2024-01-01 10:05:00")))._2 == 1L)
  }
}
