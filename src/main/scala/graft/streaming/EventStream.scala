package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events shape
  * (event_id, ts, user_id, event_type, value): the streaming halves of
  * graft.events.Sessionize, sharing the same aggregation semantics so a
  * batch backfill and the live stream produce the same rows.
  *
  * All operators take an unbounded streaming DataFrame (from
  * `spark.readStream` or MemoryStream in tests) and return a streaming
  * DataFrame; callers pick the sink/trigger. State is bounded by
  * watermarks: late rows beyond the watermark are dropped and window /
  * dedup / session state is evicted as the watermark advances — the
  * properties that make these plans runnable indefinitely at cluster
  * scale.
  */
object EventStream {

  /** Tumbling-window aggregate with watermark: counts + value stats per
    * (window, event_type), emitted when the watermark passes the window
    * end (append mode). Output schema MATCHES the batch twin
    * Sessionize.tumbling exactly — formatted-string bucket, n_events,
    * sum_value, avg_value — so a backfill and the live stream union/diff
    * without reconciliation. */
  def tumblingCounts(events: DataFrame, windowLen: String,
                     watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        // snap-divided like the batch twin (Sessionize.tumbling,
        // fuzz-45) so backfill-vs-stream rows stay byte-identical
        (round(sum(round(col("value"), 4)) * 1e4) /
          (lit(1e4) * count(lit(1)))).as("avg_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n_events"), col("sum_value"),
        col("avg_value"))

  /** Session-window aggregate (X99): per (user, gap-bounded activity
    * burst) — Structured Streaming's built-in `session_window` closes
    * a session when `gap` passes without an event, emitting it once
    * the watermark clears the session end (append mode). Batch twin:
    * the q17/q50 lag-based sessionization — same (user, session)
    * grain, so a backfill reconciles with the live stream. State per
    * OPEN session only; the watermark bounds total state, which is the
    * entire 100-TB story for streaming sessionization. */
  def sessionWindowStream(events: DataFrame, gap: String,
                          watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Sliding-window aggregate (windowLen every slide). */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String,
                    watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Streaming dedup bounded by the watermark: one row per
    * (user_id, event_type, minute), dropping later duplicates while the
    * state for a minute bucket lives only until the watermark passes it.
    * Batch twin: Sessionize.dedupWithinWindow (keep-first semantics under
    * event-time order; in a stream, arrival order decides among
    * in-watermark duplicates). */
  def dedupWithinWatermark(events: DataFrame, watermark: String): DataFrame =
    events
      // null-instant complete-case (the batch twin's fuzz-37 contract):
      // the watermark operator does NOT drop null event times — they
      // flow through and dedup under a null minute bucket, which the
      // batch twin never sees (found by StreamFuzzParitySpec)
      .filter(col("ts").isNotNull)
      .withColumn("minute", date_trunc("minute", col("ts")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")
      .drop("minute")   // helper column; output schema == input == batch twin

  /** Stream-static enrichment join: every micro-batch joins the static
    * dimension (broadcast — dimensions are bounded by definition);
    * unmatched stream rows survive with nulls (left join), mirroring the
    * batch enrichment joins' miss semantics. The static side is re-read
    * per batch by Structured Streaming, so a dimension refresh (e.g. a
    * new snapshot file) is picked up without restarting the query. */
  def enrichWithDimension(events: DataFrame, dim: DataFrame,
                          key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Streaming incremental dedup — the stream twin of
    * [[graft.dedup.Dedup.incrementalExactDedup]]: each micro-batch
    * anti-joins the STATIC accumulated content-hash set (stream-static
    * anti joins are stateless — the static side is re-read per batch, so
    * a refreshed hash-set snapshot is picked up without restart), then
    * `dropDuplicates` on the hash suppresses in-stream re-occurrences.
    * Without a watermark that dedup state is exactly the hash set of
    * content first seen on the stream — the same store the batch
    * operator accumulates between ingests (16 B per accepted doc); when
    * the payload carries event time, bound it with
    * dropDuplicatesWithinWatermark instead. First-wins is ARRIVAL order
    * (the batch twin's min-id rule collapses to it when ids are
    * ingest-ordered). */
  def incrementalDedupStream(docs: DataFrame, textCol: String,
                             seenHashes: DataFrame): DataFrame =
    docs.withColumn("__h", md5(col(textCol)))
      .join(seenHashes.select(col("content_md5").as("__h")),
        Seq("__h"), "left_anti")
      .dropDuplicates("__h")
      .drop("__h")

  /** Watermark-bounded variant of [[incrementalDedupStream]] for
    * timestamped doc streams — the bounded-state configuration SCALE.md
    * recommends for indefinitely-running ingests: in-stream suppression
    * uses `dropDuplicatesWithinWatermark` on the content hash, so the
    * dedup state store holds only hashes whose first occurrence is within
    * the watermark horizon (evicted as the watermark advances) instead of
    * every hash ever seen. A re-occurrence farther apart than the horizon
    * is NOT suppressed in-stream by design — it is caught by the
    * periodically-refreshed static `seenHashes` snapshot on the anti-join
    * side (re-read every micro-batch), which is the accumulated history
    * the batch operator maintains anyway. */
  def incrementalDedupStreamWatermarked(docs: DataFrame, textCol: String,
                                        tsCol: String, seenHashes: DataFrame,
                                        watermark: String): DataFrame =
    docs.withColumn("__h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .join(seenHashes.select(col("content_md5").as("__h")),
        Seq("__h"), "left_anti")
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Stream-stream attribution join — the streaming twin of
    * [[graft.join.RangeJoin.bandedIntervalJoin]]'s q71 use: every
    * anchor-stream row (purchase) pairs with the same user's
    * point-stream rows (click/view) from the preceding `windowSec`
    * seconds, [anchor − window, anchor). Both sides carry watermarks, so
    * Structured Streaming can bound the join state: a buffered point is
    * droppable once the anchor watermark passes point-ts + window, and
    * an anchor emits once the point watermark passes its own ts — the
    * time-range predicate plus both watermarks is exactly what Spark's
    * stream-stream join needs to compute those eviction bounds (without
    * the range condition the state would grow forever).
    *
    * Key and time columns are parameterized like the batch operator's;
    * the remaining columns must be disjoint (same contract as
    * bandedIntervalJoin). Inner semantics, append mode.
    */
  def attributionJoinStream(anchors: DataFrame, points: DataFrame,
                            key: String, anchorTime: String, pointTime: String,
                            windowSec: Long, anchorWatermark: String,
                            pointWatermark: String): DataFrame = {
    val overlap = anchors.columns.toSet.intersect(points.columns.toSet) - key
    require(overlap.isEmpty,
      s"point columns ${overlap.mkString(",")} collide with anchor " +
        "columns — rename before joining")
    val a = anchors.withWatermark(anchorTime, anchorWatermark)
    val p = points.withWatermark(pointTime, pointWatermark)
    a.join(p,
      a(key) === p(key) &&
        p(pointTime) >= a(anchorTime) - expr(s"INTERVAL $windowSec SECONDS") &&
        p(pointTime) < a(anchorTime))
      .drop(p(key))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  /** Full-precision event-time micros, mirroring `unix_micros` in the
    * batch twin. `getTime` alone truncates to milliseconds, which makes
    * gap predicates disagree with batch on sub-ms data; the sub-ms part
    * lives in `getNanos` (which also carries the ms fraction, hence the
    * floorDiv to whole seconds first). */
  private[streaming] def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** HALF_UP 4-dp rounding — the same rule as Spark's round(col, 4) in
    * the batch twin, so session values compare equal. */
  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  final case class FunnelState(reach: Seq[Long])
  final case class FunnelOut(user_id: Long, stage_idx: Int, stage: String,
                             reach_ts: Timestamp)

  /** Streaming ordered funnel — the live twin of
    * [[graft.events.Funnel.stageTimes]]: per user, emit a row the moment
    * a funnel stage is first reached (an event of stage i's type later
    * than the recorded stage-(i−1) reach time), with the reach
    * timestamp. State per user is one fixed-size reach vector
    * (8 bytes × stages), kept until the event-time timeout evicts it —
    * `ttl` past the user's last progress — and never created for users
    * with zero progress (a stage-2 event with no stage-1 reach stores
    * nothing), so state is O(users with funnel progress inside the TTL
    * horizon). Completed funnels RETAIN their state until the TTL so a
    * repeat first-stage event inside the horizon does not re-enter and
    * double-emit.
    *
    * Within a micro-batch events are processed in event-time order (the
    * sessionize discipline), so batch-vs-stream parity holds for
    * arrival patterns whose cross-batch order respects event time. The
    * DOCUMENTED divergences (inherent to bounded state, the session_seq
    * precedent): a late event arriving in a LATER batch with an EARLIER
    * timestamp than the recorded reach cannot retroactively lower it
    * (batch min-reach would), and a user re-entering the funnel more
    * than `ttl` after their last progress re-emits from stage 1 (batch,
    * holding all history, would not). Emitted reaches are monotone per
    * user either way.
    */
  def funnelStream(events: Dataset[Event], stages: Seq[String],
                   watermark: String = "10 minutes",
                   ttl: java.time.Duration = java.time.Duration.ofHours(24))
      : Dataset[FunnelOut] = {
    require(stages.nonEmpty, "stages must be non-empty")
    import events.sparkSession.implicits._
    // a type may appear at SEVERAL funnel positions (view → click →
    // view): each event is offered to every position of its type in
    // ascending order — a single Map[type -> last index] would make the
    // earlier position unreachable and the stream silently emit nothing
    val stageIdxs: Map[String, Seq[Int]] =
      stages.zipWithIndex.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    events
      // a null instant is no observation on a time axis (the batch
      // twins' fuzz-37 contract) — and micros(null) would NPE the walk
      .filter(e => e.ts != null && stageIdxs.contains(e.event_type))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val reach = state.getOption
              .map(_.reach.toArray)
              .getOrElse(Array.fill(stages.length)(Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelOut]
            rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val us = micros(e.ts)
              stageIdxs(e.event_type).foreach { i =>
                val prevOk = i == 0 || (reach(i - 1) != Long.MinValue &&
                  us > reach(i - 1))
                if (reach(i) == Long.MinValue && prevOk) {
                  reach(i) = us
                  // full-precision event time back out of micros (the
                  // micros() round-trip — Timestamp(ms) alone would
                  // truncate sub-ms reaches and break batch parity)
                  val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
                  t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
                  out += FunnelOut(userId, i + 1, stages(i), t)
                }
              }
            }
            val progress = reach.filter(_ != Long.MinValue)
            if (progress.isEmpty) {
              // zero progress = semantically no state; storing an empty
              // reach vector would grow state with every stage-2+-only
              // user for a full TTL
              if (state.exists) state.remove()
            } else {
              state.update(FunnelState(reach.toSeq))
              // timeout must sit beyond the current watermark or Spark
              // rejects it — clamp for very-late stragglers
              state.setTimeoutTimestamp(
                math.max(progress.max / 1000L + ttl.toMillis,
                  state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  final case class SessionState(sessionSeq: Long, lastTs: Long,
                                nEvents: Long, startTs: Long, totalValue: Double)
  final case class SessionOut(user_id: Long, session_seq: Long,
                              n_events: Long, duration_sec: Double,
                              total_value: Double)

  /** Stateful gap-based sessionization via flatMapGroupsWithState with an
    * EVENT-TIME timeout: a session closes (and is emitted) when a later
    * event of the same user opens the next session, or when the watermark
    * passes last-event + gap. Batch twin: Sessionize.sessions — same
    * (n_events, duration, total_value per closed session, value rounded
    * to 4 dp on both sides), gaps measured in event time on both sides.
    *
    * State per user is one open session (constant size); the event-time
    * timeout evicts idle users as the watermark advances, so total state
    * is O(users active within the watermark horizon). The eviction is
    * also the one DOCUMENTED divergence from the batch twin:
    * session_seq counts sessions within one state lifetime, so a user
    * whose state was evicted restarts at 1 while a batch backfill keeps
    * its running count — exact-parity seq numbering would require
    * unbounded per-user state. Rows are batch-identical for users whose
    * sessions fall within a single state lifetime.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
                 watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      // null-instant complete-case (the batch twin's fuzz-37 contract)
      .filter(_.ts != null)
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.sessionSeq, s.nEvents,
              (s.lastTs - s.startTs) / 1000000.0, round4(s.totalValue)))
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var current = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { e =>
              val us = micros(e.ts)
              current match {
                case Some(s) if us - s.lastTs <= gapSeconds * 1000000L =>
                  current = Some(s.copy(lastTs = us, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, s.sessionSeq, s.nEvents,
                    (s.lastTs - s.startTs) / 1000000.0, round4(s.totalValue))
                  current = Some(SessionState(s.sessionSeq + 1, us, 1L, us, e.value))
                case None =>
                  current = Some(SessionState(1L, us, 1L, us, e.value))
              }
            }
            current.foreach { s =>
              state.update(s)
              // close when the watermark passes last event + gap (ms)
              state.setTimeoutTimestamp(s.lastTs / 1000L + gapSeconds * 1000L)
            }
            closed.iterator
          }
      }
  }

  /** UTF-8 BINARY string order — Spark's own string comparison
    * (UTF8String compares byte-wise), NOT Java's UTF-16 code-unit
    * order. The two disagree exactly when a BMP char ≥ U+E000 meets a
    * supplementary char (the fuzz text-shape axis: U+FFFD sorts above
    * an astral char in UTF-16 but below it in UTF-8 bytes), so a
    * driver-side fold tie-breaking with Java ordering would diverge
    * from the batch twins' DataFrame sorts on such payloads. */
  private[streaming] val utf8Order: Ordering[String] =
    (a: String, b: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  final case class Upsert(key: Long, version: Long, payload: String)

  /** Streaming CDC compaction — the live twin of
    * [[graft.dedup.Dedup.latestByKey]] (X14): per business key, keep
    * the highest-(version, payload) row seen so far and RE-EMIT the
    * winner whenever the key receives data, so an update-mode sink
    * (e.g. a key-value store) always holds the latest version. State
    * per key is ONE row; no timeout — a CDC dimension's keys are the
    * entity universe and must survive arbitrarily long quiet periods
    * (evicting would resurrect stale versions on the next update).
    * Out-of-order and duplicate deliveries fold into the same max, so
    * the result is delivery-order-independent — the property the batch
    * twin gets from sorting, pinned in the parity spec. */
  def latestByKeyStream(updates: Dataset[Upsert]): Dataset[Upsert] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.key)
      .mapGroupsWithState[Upsert, Upsert](GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[Upsert]) =>
          // payload ties break in UTF-8 byte order ([[utf8Order]]) —
          // the batch twin's row_number sort — not Java string order
          val best = (rows ++ state.getOption.iterator)
            .max(Ordering.by[Upsert, (Long, String)](
              u => (u.version, u.payload))(
              Ordering.Tuple2(Ordering.Long, utf8Order)))
          state.update(best)
          best
      }
  }

  final case class CdcEntry(key: Long, version: Long, payload: String,
                            op: String)
  final case class CdcOut(key: Long, version: Long, payload: String,
                          deleted: Boolean)

  /** Tombstone-aware streaming CDC apply — the live twin of
    * [[graft.events.Cdc.applyLog]] (X116): state per key is the
    * highest-version log entry; when that entry is a delete the
    * emitted row carries deleted = true, so an upsert sink removes the
    * key instead of materializing a stale value (the distinction
    * [[latestByKeyStream]] doesn't make). Re-emits on every batch that
    * touches the key; out-of-order and duplicate deliveries fold into
    * the same per-key max, so the result is delivery-order-independent
    * — parity with the batch twin's sort is pinned in the spec. State
    * is one row per live-or-tombstoned key, no timeout (CDC keys are
    * the entity universe).
    */
  def cdcApplyStream(entries: Dataset[CdcEntry],
                     deleteOp: String = "D"): Dataset[CdcOut] = {
    import entries.sparkSession.implicits._
    entries.groupByKey(_.key)
      .mapGroupsWithState[CdcEntry, CdcOut](GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[CdcEntry]) =>
          // op participates in the tie key: two same-version entries
          // with equal payload but different ops (U vs D) must resolve
          // identically regardless of delivery order — the total-order
          // guarantee the batch twin gets from its explicit tie column.
          // UTF-8 byte order on the string legs ([[utf8Order]]) — the
          // batch twin's sort order, which differs from Java's on
          // mixed BMP-high/astral payloads (fuzz text axis)
          val best = (rows ++ state.getOption.iterator)
            .max(Ordering.by[CdcEntry, (Long, String, String)](
              e => (e.version, e.payload, e.op))(
              Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order)))
          state.update(best)
          CdcOut(key, best.version, best.payload, best.op == deleteOp)
      }
  }

  final case class SprtObs(key: String, ts: Timestamp, event_id: Long,
                           x: Int)
  final case class SprtState(n: Long, x: Long, llr: Double,
                             decided: Boolean)
  final case class SprtDecision(key: String, decision: String,
                                n_decision: Long, llr_at: Double)

  /** Streaming Wald SPRT — the live twin of
    * [[graft.de.Experiment.sprtBernoulli]]: per key, walk the
    * cumulative log-likelihood ratio over arriving Bernoulli
    * observations and EMIT EXACTLY ONE row the moment a decision
    * boundary is first crossed (the sequential-testing semantics:
    * the experiment monitor fires once, then stays silent). State per
    * key is three numbers + a flag, retained so post-decision
    * observations cannot re-fire; within a micro-batch rows process
    * in (ts, event_id) order, and because the walk visits
    * observations in the same order as the batch twin's window, the
    * LLR float path is IDENTICAL — parity is exact, not approximate,
    * for arrival patterns whose cross-batch order respects event time
    * (the funnelStream contract; a late straggler that would have
    * crossed earlier is the documented divergence). */
  def sprtStream(obs: Dataset[SprtObs], p0: Double, p1: Double,
                 alpha: Double = 0.05, beta: Double = 0.05)
      : Dataset[SprtDecision] = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1)
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1)
    import obs.sparkSession.implicits._
    val lnA = math.log((1 - beta) / alpha)
    val lnB = math.log(beta / (1 - alpha))
    val wPos = math.log(p1 / p0)
    val wNeg = math.log((1 - p1) / (1 - p0))
    // null-instant complete-case (the batch twin's fuzz-37 contract) —
    // micros(null) would NPE the in-batch ordering
    obs.filter(_.ts != null).groupByKey(_.key)
      .flatMapGroupsWithState[SprtState, SprtDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[SprtObs],
         state: GroupState[SprtState]) =>
          var st = state.getOption.getOrElse(SprtState(0L, 0L, 0.0,
            decided = false))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[SprtDecision]
          rows.toSeq.sortBy(o => (micros(o.ts), o.event_id))
            .foreach { o =>
              if (!st.decided) {
                val step = if (o.x == 1) wPos else wNeg
                val llr = st.llr + step
                val n = st.n + 1
                val x = st.x + (if (o.x == 1) 1L else 0L)
                if (llr >= lnA) {
                  out += SprtDecision(key, "accept_h1", n,
                    math.round(llr * 1e6) / 1e6)
                  st = SprtState(n, x, llr, decided = true)
                } else if (llr <= lnB) {
                  out += SprtDecision(key, "accept_h0", n,
                    math.round(llr * 1e6) / 1e6)
                  st = SprtState(n, x, llr, decided = true)
                } else st = SprtState(n, x, llr, decided = false)
              }
            }
          state.update(st)
          out.iterator
      }
  }

  final case class PhObs(key: String, ts: Timestamp, event_id: Long,
                         x: Double)
  final case class PhState(n: Long, sum: Double, ph: Double,
                           phMin: Double, alarmed: Boolean)
  final case class PhAlarm(key: String, n_detect: Long,
                           gap_at: Double)

  /** Streaming Page–Hinkley drift monitor (X273) — the live twin of
    * [[graft.events.Changepoint.pageHinkley]]: per key, walk the
    * deviation sum PH_t = Σ(x_i − x̄_i − δ) (x̄ = exact prefix
    * sum/count, the SAME arithmetic as the batch twin's window
    * average — no incremental-mean drift) and its running floor, and
    * EMIT EXACTLY ONE alarm the first time the gap PH_t − min PH
    * exceeds λ. Like [[sprtStream]], the monitor then stays silent —
    * the online semantics the batch operator's argmax readout can't
    * give. The 6-dp gap rounding before the λ compare matches the
    * batch twin's `__gap` exactly, so first-crossing parity is
    * testable bit-for-bit. State per key: 4 numbers + a flag, no
    * timeout (drift monitors live as long as their metric). */
  def phStream(obs: Dataset[PhObs], delta: Double, lambda: Double)
      : Dataset[PhAlarm] = {
    import obs.sparkSession.implicits._
    // null-instant complete-case (the batch twin's fuzz-37 contract)
    obs.filter(_.ts != null).groupByKey(_.key)
      .flatMapGroupsWithState[PhState, PhAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[PhObs],
         state: GroupState[PhState]) =>
          var st = state.getOption.getOrElse(
            PhState(0L, 0.0, 0.0, Double.PositiveInfinity,
              alarmed = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[PhAlarm]
          rows.toSeq.sortBy(o => (micros(o.ts), o.event_id))
            .foreach { o =>
              if (!st.alarmed) {
                val n = st.n + 1
                val s = st.sum + o.x
                val ph = st.ph + (o.x - s / n - delta)
                val phMin = math.min(st.phMin, ph)
                val gap = math.round((ph - phMin) * 1e6) / 1e6.toDouble
                if (gap > lambda) {
                  out += PhAlarm(key, n, gap)
                  st = PhState(n, s, ph, phMin, alarmed = true)
                } else st = PhState(n, s, ph, phMin, alarmed = false)
              }
            }
          state.update(st)
          out.iterator
      }
  }

  final case class KalmanObs(key: String, ts: Timestamp,
                             event_id: Long, z: Double)
  final case class KalmanState(n: Long, x: Double, p: Double,
                               k: Double, hasGain: Boolean)
  final case class KalmanEstimate(key: String, n: Long, level: Double,
                                  level_var: Double,
                                  gain: Option[Double],
                                  forecast_next: Double)

  /** Streaming local-level Kalman filter (X316) — the live twin of
    * [[graft.events.Kalman.localLevel]]: per key, the (x, P)
    * recursion advances on every arriving observation and EMITS the
    * updated estimate each time (the online semantics the batch
    * fold's final-state readout can't give — a dashboard tracks the
    * level as it settles). Identical seed contract (x₁ = z₁,
    * P₁ = rVar, gain null until the first update) and identical
    * arithmetic order, so for arrival patterns whose cross-batch
    * order respects event time (the [[sprtStream]] contract) the
    * LAST emitted row per key equals the batch operator's row
    * BIT-FOR-BIT pre-rounding — parity is exact and pinned in spec.
    * Within a micro-batch rows process in (ts, event_id) order.
    * State per key: three numbers + a flag, no timeout. */
  def kalmanStream(obs: Dataset[KalmanObs], qVar: Double,
                   rVar: Double): Dataset[KalmanEstimate] = {
    require(qVar >= 0, s"process variance must be >= 0, got $qVar")
    require(rVar > 0, s"observation variance must be > 0, got $rVar")
    import obs.sparkSession.implicits._
    // null-instant complete-case (the batch twin's fuzz-37 contract)
    obs.filter(_.ts != null).groupByKey(_.key)
      .flatMapGroupsWithState[KalmanState, KalmanEstimate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KalmanObs],
         state: GroupState[KalmanState]) =>
          var st = state.getOption.getOrElse(
            KalmanState(0L, 0.0, 0.0, 0.0, hasGain = false))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[KalmanEstimate]
          rows.toSeq.sortBy(o => (micros(o.ts), o.event_id))
            .foreach { o =>
              st =
                if (st.n == 0L)
                  KalmanState(1L, o.z, rVar, 0.0, hasGain = false)
                else {
                  val pp = st.p + qVar
                  val k = pp / (pp + rVar)
                  KalmanState(st.n + 1, st.x + k * (o.z - st.x),
                    (1.0 - k) * pp, k, hasGain = true)
                }
              // HALF_UP like the batch operator's round(col, 6), so
              // the pinned last-row parity is exact even at rounding
              // boundaries
              def r6(v: Double): Double = BigDecimal(v)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              out += KalmanEstimate(key, st.n, r6(st.x), r6(st.p),
                if (st.hasGain) Some(r6(st.k)) else None, r6(st.x))
            }
          state.update(st)
          out.iterator
      }
  }
}
