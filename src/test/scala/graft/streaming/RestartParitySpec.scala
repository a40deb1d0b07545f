package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.dedup.Dedup
import graft.streaming.EventStream.{PhObs, SprtObs}

/** Restart parity for streaming state (round-12 task 3): nothing had
  * proven a killed-and-resumed stream converges to the same output as
  * an unbroken one.
  *
  *  - NearDupIngest: history lives on the DRIVER — durable only via
  *    [[NearDupIngest.saveHistory]]/[[NearDupIngest.loadHistory]]
  *    (bucketed parquet). Tri-parity pinned: batch-at-a-time = unbroken
  *    stream = stream killed mid-corpus and resumed from the persisted
  *    history.
  *  - SPRT / Page–Hinkley monitors: state lives in the ENGINE's state
  *    store — restart parity comes from `checkpointLocation`, proven by
  *    resuming a second query from the same checkpoint and asserting a
  *    decision whose boundary crossing SPANS the restart (impossible
  *    unless the pre-restart walk was restored). */
class RestartParitySpec extends SparkSuite {

  private def ts(i: Int) =
    Timestamp.valueOf(f"2024-01-01 10:00:${i % 60}%02d.${i}%06d")

  // ---------------------------------------------------------- near-dup

  private val seedDocs = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
  private val batches: Seq[Seq[(Long, String)]] = Seq(
    Seq((101L, "first novel document body about distributed engines"),
      (102L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")),
    Seq((201L, "second novel document body about parquet bucketing"),
      (202L, "first novel document body about distributed engines")),
    // 301 matches a doc accepted BEFORE the kill point; 302 matches one
    // accepted AFTER it — both must resolve identically in the resumed
    // run for the restored history to be proven complete
    Seq((301L, "first novel document body about distributed engines"),
      (302L, "third novel document body about restart semantics")),
    Seq((401L, "third novel document body about restart semantics"),
      (402L, "fourth novel document body closing out the corpus")))

  private def key(r: Row) = (r.getLong(0), r.getBoolean(1),
    if (r.isNullAt(2)) None else Some(r.getLong(2)),
    if (r.isNullAt(3)) None else Some(r.getDouble(3)))

  private def historySigs =
    Dedup.minhashSignatures(
      spark.createDataFrame(seedDocs).toDF("id", "text"), "id", "text")

  test("near-dup ingest: killed mid-corpus + resumed from persisted " +
    "bucketed history == unbroken run (accept set and all rows)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // ---- unbroken run over all four micro-batches
    val inU = MemoryStream[(Long, String)]
    val unbrokenIngest = new NearDupIngest(historySigs, "id", "text")
    val unbroken = mutable.Map.empty[Long, Set[Any]]
    val qU = unbrokenIngest.start(inU.toDF().toDF("id", "text")) {
      (res, bid) => unbroken(bid) = res.collect().map(key).toSet[Any]
    }
    try {
      batches.foreach { b => inU.addData(b: _*); qU.processAllAvailable() }
    } finally qU.stop()

    // ---- broken run: batches 0-1, persist history, KILL; new ingest
    //      restored from the bucketed table, batches 2-3
    val path = Files.createTempDirectory("graft-ndhist").toString
    val inA = MemoryStream[(Long, String)]
    val ingestA = new NearDupIngest(historySigs, "id", "text")
    val resumed = mutable.Map.empty[Long, Set[Any]]
    val qA = ingestA.start(inA.toDF().toDF("id", "text")) {
      (res, bid) => resumed(bid) = res.collect().map(key).toSet[Any]
    }
    try {
      batches.take(2).foreach { b =>
        inA.addData(b: _*); qA.processAllAvailable()
      }
    } finally qA.stop()
    NearDupIngest.saveHistory(ingestA.currentHistory,
      "nd_restart_hist", s"$path/hist")
    // the "crash": ingestA and its driver-side history are gone; the
    // resumed ingest knows only the persisted table
    val restored = NearDupIngest.loadHistory(spark, "nd_restart_hist")
    val inB = MemoryStream[(Long, String)]
    val ingestB = new NearDupIngest(restored, "id", "text")
    val qB = ingestB.start(inB.toDF().toDF("id", "text")) {
      (res, bid) => resumed(bid + 2) = res.collect().map(key).toSet[Any]
    }
    try {
      batches.drop(2).foreach { b =>
        inB.addData(b: _*); qB.processAllAvailable()
      }
    } finally qB.stop()

    assert(resumed.keySet == unbroken.keySet)
    unbroken.keys.foreach(bid =>
      assert(resumed(bid) == unbroken(bid), s"batch $bid diverged"))
    // final accept sets agree too (history equivalence, not just rows)
    val hU = unbrokenIngest.currentHistory
      .select("id").as[Long].collect().toSet
    val hB = ingestB.currentHistory.select("id").as[Long].collect().toSet
    assert(hU == hB)
    assert(hU == Set(10L, 101L, 201L, 302L, 402L))
    spark.sql("drop table if exists nd_restart_hist")
  }

  test("saveHistory writes a bucketed table loadHistory reads back " +
    "losslessly") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-ndhist2").toString
    val h = historySigs
    NearDupIngest.saveHistory(h, "nd_hist_rt", s"$path/hist", buckets = 8)
    val back = NearDupIngest.loadHistory(spark, "nd_hist_rt")
    assert(back.as[(Long, Seq[Long])].collect().toSet ==
      h.as[(Long, Seq[Long])].collect().toSet)
    // bucket spec survived: the catalog reports 8 buckets on id
    val desc = spark.sql("describe extended nd_hist_rt")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Num Buckets").contains("8"))
    assert(desc.get("Bucket Columns").exists(_.contains("id")))
    spark.sql("drop table if exists nd_hist_rt")
  }

  // ---------------------------------------------------- engine monitors

  test("sprtStream: a decision whose boundary crossing spans a " +
    "checkpoint restart is emitted at the cumulative index") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ck = Files.createTempDirectory("graft-ck-sprt-restart").toString
    val in = MemoryStream[SprtObs]
    // the memory sink cannot recover from a checkpoint — foreachBatch
    // can (the production shape), collecting emissions across restarts
    val got = mutable.ArrayBuffer.empty[(String, String, Long)]
    def runOnce(): Unit = {
      val q = EventStream.sprtStream(in.toDS(), p0 = 0.5, p1 = 0.9)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[EventStream.SprtDecision],
           _: Long) =>
            { got ++= b.collect().map(d => (d.key, d.decision, d.n_decision)); () }
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    // 4 successes: LLR = 4·ln(1.8) ≈ 2.351 < ln(19) ≈ 2.944 — undecided
    in.addData((1 to 4).map(i => SprtObs("r", ts(i), i, 1)))
    runOnce()
    assert(got.isEmpty)
    // kill + restart from the same checkpoint; 2 more successes cross
    // at CUMULATIVE n = 6. A fresh walk seeing only these 2 would sit
    // at LLR ≈ 1.18 and stay silent forever — emission at n_decision=6
    // is only possible if the state store restored the pre-kill walk.
    in.addData((5 to 6).map(i => SprtObs("r", ts(i), i, 1)))
    runOnce()
    assert(got.toSeq == Seq(("r", "accept_h1", 6L)))
  }

  test("phStream: an alarm that needs the pre-restart mean history " +
    "fires at the cumulative index after restart") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ck = Files.createTempDirectory("graft-ck-ph-restart").toString
    val in = MemoryStream[PhObs]
    val got = mutable.ArrayBuffer.empty[(String, Long, Double)]
    def runOnce(): Unit = {
      val q = EventStream.phStream(in.toDS(), delta = 0.0, lambda = 10.0)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[EventStream.PhAlarm],
           _: Long) =>
            { got ++= b.collect().map(a => (a.key, a.n_detect, a.gap_at)); () }
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    // three 0s: PH walk flat at 0 — no alarm
    in.addData((1 to 3).map(i => PhObs("m", ts(i), i, 0.0)))
    runOnce()
    assert(got.isEmpty)
    // restart, then two 10s: deviations vs the RESTORED prefix mean
    // (x̄ climbs 2.5 → 4) push the gap to 13.5 > λ at cumulative n = 5.
    // A fresh walk would track x̄ = 10 exactly and never alarm.
    in.addData(Seq(PhObs("m", ts(4), 4, 10.0), PhObs("m", ts(5), 5, 10.0)))
    runOnce()
    assert(got.toSeq == Seq(("m", 5L, 13.5)))
  }
}
