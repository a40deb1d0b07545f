package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.dedup.Dedup

/** Batch-vs-stream parity for the incremental near-dup ingest (round-10
  * verdict task 5): the foreachBatch twin fed the same documents in the
  * same micro-batch grouping must produce exactly the batch operator's
  * rows, and its evolved history must round-trip (a later exact copy of
  * an accepted doc matches it). */
class NearDupIngestSpec extends SparkSuite {
  import spark.implicits._

  private val seedDocs = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (20L, "one two three four five six seven eight nine ten"))

  private val batch1 = Seq(
    (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (102L, "completely different words with no shared shingles at all"))

  private val batch2 = Seq(
    // exact copy of batch1's accepted doc: must match 102 via the
    // EVOLVED history, proving state actually accumulated
    (201L, "completely different words with no shared shingles at all"),
    (202L, "yet another genuinely novel document body for the stream"))

  private def historySigs =
    Dedup.minhashSignatures(seedDocs.toDF("id", "text"), "id", "text")

  private def key(r: Row) = (r.getLong(0), r.getBoolean(1),
    if (r.isNullAt(2)) None else Some(r.getLong(2)),
    if (r.isNullAt(3)) None else Some(r.getDouble(3)))

  test("foreachBatch twin matches the batch operator per micro-batch " +
    "and evolves history across batches") {
    // ---- batch reference: two sequential ingests with manual evolution
    val h0 = historySigs
    val ref1 = Dedup.incrementalMinHashDedup(
      batch1.toDF("id", "text"), "id", "text", h0)
    val h1 = Dedup.evolveSignatureHistory(h0, ref1)
    val ref2 = Dedup.incrementalMinHashDedup(
      batch2.toDF("id", "text"), "id", "text", h1)

    // ---- streaming twin: same docs, same micro-batch grouping
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val ingest = new NearDupIngest(historySigs, "id", "text")
    val got = mutable.Map.empty[Long, Seq[Row]]
    val q = ingest.start(in.toDF().toDF("id", "text")) { (res, batchId) =>
      got(batchId) = res.collect().toSeq
    }
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    assert(got.keySet == Set(0L, 1L))
    assert(got(0L).map(key).toSet == ref1.collect().map(key).toSet)
    assert(got(1L).map(key).toSet == ref2.collect().map(key).toSet)
    // the cross-batch match is the load-bearing row: 201 matched the
    // doc ACCEPTED in micro-batch 0, not anything in the seed history
    val m201 = got(1L).map(key).find(_._1 == 201L).get
    assert(m201 == ((201L, false, Some(102L), Some(1.0))))
    // evolved history = seed + the two ACCEPTED docs (101 is a
    // near-dup of seed doc 10 and is never appended)
    val hist = ingest.currentHistory.select("id").as[Long].collect().toSet
    assert(hist == Set(10L, 20L, 102L, 202L))
  }

  test("evolveSignatureHistory appends only accepted rows; " +
    "compactSignatureHistory collapses replayed ids to one row") {
    val h0 = historySigs
    val res = Dedup.incrementalMinHashDedup(
      batch1.toDF("id", "text"), "id", "text", h0)
    val h1 = Dedup.evolveSignatureHistory(h0, res)
    assert(h1.count() == 3) // 101 is a near-dup of 10, only 102 appends
    // replay the same batch against the PRE-evolution history (the
    // crash-recovery shape): 102 is accepted a second time, so the
    // evolved history now carries a duplicate id
    val h2 = Dedup.evolveSignatureHistory(h1,
      Dedup.incrementalMinHashDedup(
        batch1.toDF("id", "text"), "id", "text", h0))
    assert(h2.count() == 4)
    val compacted = Dedup.compactSignatureHistory(h2)
    assert(compacted.count() == 3)
    assert(compacted.select("id").as[Long].collect().toSet ==
      Set(10L, 20L, 102L))
  }
}
