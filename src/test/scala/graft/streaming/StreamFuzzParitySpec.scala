package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.EventStream._

/** Batch-vs-stream parity on FUZZ-SHAPED inputs (round-13 task 2): the
  * differential-fuzz program's adversarial axes — null instants
  * (fuzz v2), astral/CRLF/whitespace/NFD text shapes (fuzz v3), sub-ms
  * timestamps, duplicate instants, scrambled arrival order, extreme
  * values — had only ever run against batch oracles; every streaming
  * parity spec used canonical hand-built fixtures. Each test here
  * generates seeded adversarial input and asserts the stream equals its
  * batch twin under the twin's documented contract (complete-case on
  * null instants, UTF-8 byte order on string tie-breaks, event-time
  * processing order within a micro-batch). */
class StreamFuzzParitySpec extends SparkSuite {
  import spark.implicits._

  private val baseMs = Timestamp.valueOf("2024-01-01 10:00:00").getTime

  private def tsAt(sec: Int, micros: Int = 0): Timestamp = {
    val t = new Timestamp(baseMs + sec * 1000L)
    t.setNanos(micros * 1000)
    t
  }

  /** Seeded adversarial events: null instants every `nullTsEvery`-th
    * row, sub-ms timestamps on every third, values on the exact 0.25
    * grid (so cross-side float sums cannot re-associate differently),
    * ARRIVAL order shuffled. `uniqueTs` gives a collision-free time
    * axis (the walk operators' tie contract differs between batch and
    * stream by design); false allows duplicate instants. */
  private def fuzzEvents(seed: Int, n: Int, nUsers: Int,
                         types: Seq[String], nullTsEvery: Int,
                         uniqueTs: Boolean,
                         spreadSec: Int): Seq[Event] = {
    val rnd = new scala.util.Random(seed)
    val evs = (1 to n).map { i =>
      val tsv =
        if (nullTsEvery > 0 && i % nullTsEvery == 0) null
        else if (uniqueTs) tsAt(i, if (i % 3 == 0) 499 else 0)
        else tsAt(rnd.nextInt(spreadSec) + 1)
      Event(i.toLong, tsv, (rnd.nextInt(nUsers) + 1).toLong,
        types(rnd.nextInt(types.size)), (i % 7) * 0.25)
    }
    rnd.shuffle(evs)
  }

  private def runToMemory(df: DataFrame, name: String,
                          mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-ck-$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  private val astral = "🀄" // U+1F004, 4 UTF-8 bytes

  // -------------------------------------------------- windowed aggregates

  test("fuzz: tumblingCounts == batch tumbling (null instants dropped, " +
    "astral event types, duplicate instants)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = fuzzEvents(seed = 11, n = 400, nUsers = 6,
      types = Seq("click", "view", astral), nullTsEvery = 7,
      uniqueTs = false, spreadSec = 4 * 3600)
    val in = MemoryStream[Event]
    in.addData(evs: _*)
    in.addData(Event(9999, tsAt(30 * 24 * 3600), 999, "flush", 0.0))
    runToMemory(EventStream.tumblingCounts(in.toDF(), "1 hour",
      "10 minutes"), "fz_tumbling")
    val got = spark.table("fz_tumbling")
      .filter($"bucket" < "2024-01-02")
      .as[(String, String, Long, Double, Double)].collect().toSet
    val batch = graft.events.Sessionize.tumbling(
        evs.filter(_.ts != null).toDF(), "ts", "event_type", "value", "hour")
      .as[(String, String, Long, Double, Double)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty && got.exists(_._2 == astral))
  }

  test("fuzz: session_window stream == batch session_window on the " +
    "same adversarial events") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = fuzzEvents(seed = 12, n = 300, nUsers = 5,
      types = Seq("click", astral), nullTsEvery = 8,
      uniqueTs = false, spreadSec = 3600)
    val in = MemoryStream[Event]
    in.addData(evs: _*)
    in.addData(Event(9999, tsAt(30 * 24 * 3600), 999, "flush", 0.0))
    runToMemory(EventStream.sessionWindowStream(in.toDF(), "5 minutes",
      "0 seconds"), "fz_sessionwin")
    val got = spark.table("fz_sessionwin")
      .filter($"user_id" =!= 999L)
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    val batch = evs.filter(_.ts != null).toDF()
      .groupBy($"user_id", session_window($"ts", "5 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("sum_value"))
      .select($"user_id", $"session_window.start", $"session_window.end",
        $"n_events", $"sum_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("fuzz: dedupWithinWatermark keeps the batch twin's key set and " +
    "emits no null-instant rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = fuzzEvents(seed = 13, n = 300, nUsers = 4,
      types = Seq("click", "view"), nullTsEvery = 6,
      uniqueTs = false, spreadSec = 600)
    val in = MemoryStream[Event]
    in.addData(evs: _*)
    in.addData(Event(9999, tsAt(30 * 24 * 3600), 999, "flush", 0.0))
    runToMemory(EventStream.dedupWithinWatermark(in.toDF(), "10 minutes"),
      "fz_dedup")
    val got = spark.table("fz_dedup").filter($"user_id" =!= 999L)
    assert(got.filter($"ts".isNull).count() == 0L)
    val gotKeys = got
      .select($"user_id", $"event_type", date_trunc("minute", $"ts"))
      .as[(Long, String, Timestamp)].collect()
    val batchKeys = graft.events.Sessionize.dedupWithinWindow(
        evs.filter(_.ts != null).toDF(), "ts", "user_id", "event_type")
      .select($"user_id", $"event_type", date_trunc("minute", $"ts"))
      .as[(Long, String, Timestamp)].collect()
    // one surviving row per (user, type, minute) on both sides; which
    // row survives differs by contract (arrival vs min-ts order)
    assert(gotKeys.length == gotKeys.distinct.length)
    assert(gotKeys.toSet == batchKeys.toSet)
  }

  // ------------------------------------------------------- text operators

  private val fuzzTextPool = Seq(
    astral,                                  // 1-char astral doc
    "line one\r\nline two\r\n",              // CRLF structure
    "   \t  ",                               // whitespace-only
    "éclair nfd body",                 // NFD combining accent
    "",                                      // empty doc
    "plain body of text",
    s"répété $astral tail",
    "plain body of text")                    // seeded exact dup

  test("fuzz: incrementalDedupStream accepts exactly the batch replay's " +
    "content set on adversarial text shapes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(14)
    val docs = (1 to 60).map(i =>
      (i.toLong, fuzzTextPool(rnd.nextInt(fuzzTextPool.size))))
    val (b1, b2) = docs.splitAt(30)
    val seen0 = Seq.empty[(String)].toDF("content_md5")

    // batch replay: ingest b1, evolve the seen set, ingest b2
    val ref1 = graft.dedup.Dedup.incrementalExactDedup(
      b1.toDF("id", "text"), "id", "text", seen0)
    val seen1 = seen0.union(ref1.select(md5($"text")))
    val ref2 = graft.dedup.Dedup.incrementalExactDedup(
      b2.toDF("id", "text"), "id", "text", seen1)
    val refContents = (ref1.select($"text").as[String].collect() ++
      ref2.select($"text").as[String].collect()).toSet

    val in = MemoryStream[(Long, String)]
    val out = EventStream.incrementalDedupStream(
      in.toDF().toDF("id", "text"), "text", seen0)
    val q = out.writeStream.format("memory").queryName("fz_incdedup")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-fzincdedup").toString)
      .start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val gotContents = spark.table("fz_incdedup")
      .select($"text").as[String].collect().toSet
    assert(gotContents == refContents)
    // every distinct fuzz shape present in the input was accepted once
    assert(gotContents == docs.map(_._2).toSet)
  }

  // ------------------------------------------------------- walk operators

  test("fuzz: funnelStream == batch stageTimes with an astral stage " +
    "name, null instants, scrambled arrival") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stages = Seq("signup", astral, "buy")
    val evs = fuzzEvents(seed = 15, n = 250, nUsers = 8,
      types = stages ++ Seq("noise", "view"), nullTsEvery = 9,
      uniqueTs = true, spreadSec = 0)
    val in = MemoryStream[Event]
    in.addData(evs: _*)
    in.addData(Event(9999, tsAt(30 * 24 * 3600), 999, "signup", 0.0))
    runToMemory(EventStream.funnelStream(in.toDS(), stages).toDF(),
      "fz_funnel")
    val got = spark.table("fz_funnel")
      .filter($"user_id" =!= 999L)
      .select("user_id", "stage_idx", "reach_ts")
      .as[(Long, Int, Timestamp)].collect().toSet
    val batch = graft.events.Funnel.stageTimes(
        evs.filter(_.ts != null).toDF(), "user_id", "event_type", "ts",
        stages)
      .select($"user_id", $"__t0", $"__t1", $"__t2")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect()
      .flatMap { case (u, t0, t1, t2) =>
        Seq(t0.map((u, 1, _)), t1.map((u, 2, _)), t2.map((u, 3, _))).flatten
      }.toSet
    assert(got == batch)
    assert(got.exists(_._2 == 2)) // the astral stage was actually reached
  }

  test("fuzz: sessionize == batch sessions on sub-ms instants, null " +
    "instants, exact-grid values") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = fuzzEvents(seed = 16, n = 200, nUsers = 5,
      types = Seq("click"), nullTsEvery = 10,
      uniqueTs = true, spreadSec = 0)
    val in = MemoryStream[Event]
    in.addData(evs: _*)
    in.addData(Event(9999, tsAt(30 * 24 * 3600), 999, "flush", 0.0))
    val out = EventStream.sessionize(in.toDS(), gapSeconds = 13L)
    val q = out.writeStream.format("memory").queryName("fz_sessions")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-fzsess").toString)
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("fz_sessions")
      .filter($"user_id" =!= 999L)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    val batch = graft.events.Sessionize.sessions(
        evs.filter(_.ts != null).toDF(), "ts", "user_id", "value", 13L)
      .select($"user_id", $"session_seq".cast("long"), $"n_events",
        $"duration_sec", $"total_value")
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("fuzz: sprtStream decisions == batch sprtBernoulli first " +
    "crossings across a micro-batch split") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val keys = Seq("a", "b", "c", "d", "e", "f")
    val obs = keys.flatMap { k =>
      (1 to 40).map(i => SprtObs(k, tsAt(i), i.toLong,
        if (rnd.nextDouble() < (if (k < "d") 0.8 else 0.45)) 1 else 0))
    }
    // cross-batch order respects event time; arrival inside scrambled
    val (b1, b2) = obs.partition(_.event_id <= 20)
    val in = MemoryStream[SprtObs]
    val got = mutable.ArrayBuffer.empty[(String, String, Long)]
    val q = EventStream.sprtStream(in.toDS(), p0 = 0.4, p1 = 0.6)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-fzsprt").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[SprtDecision], _: Long) =>
          { got ++= b.collect().map(d => (d.key, d.decision, d.n_decision)); () }
      }
      .start()
    in.addData(new scala.util.Random(1).shuffle(b1)); q.processAllAvailable()
    in.addData(new scala.util.Random(2).shuffle(b2)); q.processAllAvailable()
    q.stop()
    val batch = graft.de.Experiment.sprtBernoulli(
        obs.toDF("key", "ts", "event_id", "x"), "key",
        Seq("ts", "event_id"), "x", p0 = 0.4, p1 = 0.6)
      .filter($"decision" =!= "continue")
      .select($"key", $"decision", $"n_decision".cast("long"))
      .as[(String, String, Long)].collect().toSet
    assert(got.toSet == batch)
    assert(got.nonEmpty)
  }

  test("fuzz: phStream first alarm == the batch walk's first crossing " +
    "on extreme values") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(18)
    val pool = Seq(0.0, 1.0, -1.0, 1e6, -1e6, 2.5, 0.125)
    val obs = Seq("m1", "m2", "m3").flatMap { k =>
      (1 to 60).map(i => PhObs(k, tsAt(i), i.toLong,
        pool(rnd.nextInt(pool.size))))
    }
    val in = MemoryStream[PhObs]
    val got = mutable.ArrayBuffer.empty[(String, Long, Double)]
    val q = EventStream.phStream(in.toDS(), delta = 0.1, lambda = 5.0)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-fzph").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[PhAlarm], _: Long) =>
          { got ++= b.collect().map(a => (a.key, a.n_detect, a.gap_at)); () }
      }
      .start()
    in.addData(new scala.util.Random(3).shuffle(obs))
    q.processAllAvailable(); q.stop()
    // batch first crossing: the SAME cumulative walk (identical float
    // path), first index where the 6-dp gap exceeds lambda
    val wOrd = Window.partitionBy($"key").orderBy($"ts", $"event_id")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = $"x".cast("double")
    val batch = obs.toDF("key", "ts", "event_id", "x")
      .withColumn("__dev", x - avg(x).over(wCum) - lit(0.1))
      .withColumn("__ph", sum($"__dev").over(wCum))
      .withColumn("__gap", round($"__ph" - min($"__ph").over(wCum), 6))
      .withColumn("__i", row_number().over(wOrd))
      .filter($"__gap" > 5.0)
      .groupBy($"key")
      .agg(min($"__i").cast("long").as("n"), min_by($"__gap", $"__i").as("g"))
      .as[(String, Long, Double)].collect().toSet
    assert(got.toSet == batch)
    assert(got.nonEmpty)
  }

  test("fuzz: kalmanStream last emission == batch localLevel on " +
    "extreme observations") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(19)
    val pool = Seq(0.0, 1e9, -1e9, 3.25, -0.5, 42.0)
    val obs = Seq("k1", "k2").flatMap { k =>
      (1 to 30).map(i => KalmanObs(k, tsAt(i), i.toLong,
        pool(rnd.nextInt(pool.size))))
    }
    val (b1, b2) = obs.partition(_.event_id <= 15)
    val in = MemoryStream[KalmanObs]
    val got = mutable.ArrayBuffer.empty[(String, Long, Double, Double, Option[Double])]
    val q = EventStream.kalmanStream(in.toDS(), qVar = 0.04, rVar = 2.0)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-fzkalman").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[KalmanEstimate], _: Long) =>
          { got ++= b.collect().map(e =>
              (e.key, e.n, e.level, e.level_var, e.gain)); () }
      }
      .start()
    in.addData(new scala.util.Random(4).shuffle(b1)); q.processAllAvailable()
    in.addData(new scala.util.Random(5).shuffle(b2)); q.processAllAvailable()
    q.stop()
    val lastPerKey = got.groupBy(_._1).map { case (k, rs) =>
      val l = rs.maxBy(_._2); (k, l._2, l._3, l._4, l._5.get)
    }.toSet
    val batch = graft.events.Kalman.localLevel(
        obs.toDF("key", "ts", "event_id", "z"), "key", "ts", "z",
        qVar = 0.04, rVar = 2.0)
      .select($"key", $"n", $"level", $"level_var", $"gain")
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(lastPerKey == batch)
  }

  // --------------------------------------------------------- CDC + joins

  test("fuzz: latestByKeyStream final state == batch latestByKey when " +
    "version ties break on mixed BMP/astral payloads") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(20)
    // "�" vs astral is the UTF-16/UTF-8 order-flip pair
    val payloads = Seq("�", astral, "", "z", "aa\r\n")
    val ups = (1 to 120).map(i => Upsert((i % 10).toLong,
      rnd.nextInt(4).toLong, payloads(rnd.nextInt(payloads.size))))
    val in = MemoryStream[Upsert]
    val q = EventStream.latestByKeyStream(in.toDS())
      .writeStream.format("memory").queryName("fz_latest")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-fzlatest").toString)
      .start()
    ups.grouped(40).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val finals = spark.table("fz_latest").as[Upsert].collect()
      .zipWithIndex.groupBy(_._1.key)
      .map { case (k, rs) => k -> rs.maxBy(_._2)._1 }
    val batch = graft.dedup.Dedup.latestByKey(
        ups.toDF("key", "version", "payload"),
        Seq("key"), Seq("version", "payload"))
      .as[Upsert].collect().map(u => u.key -> u).toMap
    assert(finals == batch)
  }

  test("fuzz: cdcApplyStream surviving keys == batch applyLog on " +
    "astral payloads and version ties") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(21)
    val payloads = Seq("�", astral, "", "x")
    // version ties break on payload; no exact (version, payload) tie
    // across different ops (that order is pinned by CdcStreamSpec)
    val entries = (1 to 90).map { i =>
      val v = rnd.nextInt(4).toLong
      val p = payloads(rnd.nextInt(payloads.size)) + (i % 3)
      CdcEntry((i % 8).toLong, v, p, if (rnd.nextInt(5) == 0) "D" else "U")
    }
    val in = MemoryStream[CdcEntry]
    val q = EventStream.cdcApplyStream(in.toDS())
      .writeStream.format("memory").queryName("fz_cdc")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-fzcdc").toString)
      .start()
    entries.grouped(30).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val finals = spark.table("fz_cdc").as[CdcOut].collect()
      .zipWithIndex.groupBy(_._1.key)
      .map { case (k, rs) => k -> rs.maxBy(_._2)._1 }
    val survivors = finals.filterNot(_._2.deleted)
      .map { case (k, o) => k -> o.payload }
    // batch twin needs a TOTAL per-key order: (version, payload) is
    // unique per key here, op folded into the payload tie by contract
    val batch = graft.events.Cdc.applyLog(
        entries.toDF("key", "version", "payload", "op"),
        "key", "version", "payload", "op", Seq("payload"), "D")
      .select($"key", $"payload").as[(Long, String)].collect().toMap
    assert(survivors == batch)
  }

  test("fuzz: attributionJoinStream == batch bandedIntervalJoin on " +
    "boundary-exact and null instants") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(22)
    val anchors = (1 to 40).map(i => ((i % 5).toLong + 1,
      if (i % 11 == 0) null else tsAt(60 + rnd.nextInt(300)),
      900L + i)) ++
      Seq((1L, tsAt(100), 990L)) // pinned boundary anchor
    val points = (1 to 80).map(i => ((i % 5).toLong + 1,
      if (i % 13 == 0) null else tsAt(rnd.nextInt(360)),
      500L + i)) ++
      Seq((1L, tsAt(40), 598L),  // == anchor990 - window: INCLUDED
        (1L, tsAt(100), 599L))   // == anchor990 exactly: EXCLUDED
    val aIn = MemoryStream[(Long, Timestamp, Long)]
    val pIn = MemoryStream[(Long, Timestamp, Long)]
    val aDf = aIn.toDF().toDF("user_id", "a_ts", "a_id")
    val pDf = pIn.toDF().toDF("user_id", "p_ts", "p_id")
    val out = EventStream.attributionJoinStream(aDf, pDf, "user_id",
      "a_ts", "p_ts", windowSec = 60L,
      anchorWatermark = "0 seconds", pointWatermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("fz_attr")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-fzattr").toString)
      .start()
    pIn.addData(points: _*); q.processAllAvailable()
    aIn.addData(anchors: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("fz_attr")
      .select($"user_id", $"a_id", $"p_id")
      .as[(Long, Long, Long)].collect().toSet
    val intervals = anchors.toDF("user_id", "a_ts", "a_id")
      .withColumn("a_start", expr("a_ts - INTERVAL 60 SECONDS"))
    val batch = graft.join.RangeJoin.bandedIntervalJoin(
        intervals, points.toDF("user_id", "p_ts", "p_id"),
        "user_id", "a_start", "a_ts", "p_ts", bandWidthSec = 60L)
      .select($"user_id", $"a_id", $"p_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got.contains((1L, 990L, 598L)))  // inclusive lower bound
    assert(!got.exists(t => t._2 == 990L && t._3 == 599L)) // exclusive upper
  }

  test("fuzz: NearDupIngest batch-at-a-time == stream on adversarial " +
    "text shapes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val docs = (1 to 40).map(i =>
      (i.toLong, fuzzTextPool(rnd.nextInt(fuzzTextPool.size)) + " " +
        ("tok" + (i % 4) + " ") * 8))
    val (b1, b2) = docs.splitAt(20)
    val seed = Seq((1000L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val sigs = graft.dedup.Dedup.minhashSignatures(
      seed.toDF("id", "text"), "id", "text")

    val ref1 = graft.dedup.Dedup.incrementalMinHashDedup(
      b1.toDF("id", "text"), "id", "text", sigs)
    val h1 = graft.dedup.Dedup.evolveSignatureHistory(sigs, ref1)
    val ref2 = graft.dedup.Dedup.incrementalMinHashDedup(
      b2.toDF("id", "text"), "id", "text", h1)
    val refKeys = (ref1.collect() ++ ref2.collect())
      .map(r => (r.getLong(0), r.getBoolean(1))).toSet

    val in = MemoryStream[(Long, String)]
    val ingest = new NearDupIngest(sigs, "id", "text")
    val got = mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = ingest.start(in.toDF().toDF("id", "text")) { (res, _) =>
      got ++= res.collect().map(r => (r.getLong(0), r.getBoolean(1))); ()
    }
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == refKeys)
  }
}
