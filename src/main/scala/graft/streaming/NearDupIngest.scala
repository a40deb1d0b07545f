package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup

/** Streaming twin of [[graft.dedup.Dedup.incrementalMinHashDedup]] —
  * the near-dup rung of the incremental-dedup ladder (the exact rung
  * is [[EventStream.incrementalDedupStream]]'s stateless stream-static
  * anti-join). Near-dup CANNOT be a single declarative stream: each
  * batch must join against signatures accepted by EARLIER batches of
  * the same stream, a self-feeding dependency Structured Streaming's
  * stream-static join forbids (the static side is fixed per batch) and
  * multi-aggregate append mode cannot express. The production shape is
  * therefore `foreachBatch`: every micro-batch runs the BATCH operator
  * against the accumulated signature history, then appends its
  * accepted signatures to that history — exactly the per-ingest loop
  * the batch operator documents, driven by the streaming engine's
  * micro-batch clock. Batch-vs-stream parity is pinned by
  * NearDupIngestSpec (same docs, same micro-batch grouping → identical
  * rows).
  *
  * History state: held as a DataFrame, `localCheckpoint`ed after each
  * evolution so lineage stays one batch deep (16 longs ≈ 128 B per
  * accepted doc — millions of docs fit a single executor's cache; at
  * larger corpus scale, persist the history to a bucketed table
  * between restarts and pass it back as `initialHistory`).
  */
final class NearDupIngest(initialHistory: DataFrame,
                          idCol: String, textCol: String,
                          shingleSize: Int = 3, numHashes: Int = 16,
                          bands: Int = 4, minAgreement: Double = 0.5,
                          maxBucket: Int = 100000) {

  @volatile private var history: DataFrame =
    initialHistory.select("id", "sig")

  /** Current accumulated signature history (id, sig) — read this after
    * the stream stops to persist state for the next run. */
  def currentHistory: DataFrame = history

  /** Screen one (micro-)batch against the accumulated history and fold
    * its accepted signatures in. Returns the batch operator's output:
    * (id, is_new, matched_history_id, sig_agreement, sig). Callable
    * directly for batch-at-a-time ingest without a streaming engine —
    * the parity spec runs both paths through this one method. */
  def processBatch(batch: DataFrame): DataFrame = {
    val out = Dedup.incrementalMinHashDedup(batch, idCol, textCol,
      history, shingleSize, numHashes, bands, minAgreement, maxBucket)
    // out is already localCheckpoint-ed by the batch operator, so the
    // union below never recomputes the screen; checkpoint the evolved
    // history to keep lineage one batch deep.
    history = Dedup.evolveSignatureHistory(history, out).localCheckpoint()
    out
  }

  /** Attach to a streaming `docs` frame: each micro-batch is screened
    * and `sink` receives (batchResult, batchId). The foreachBatch body
    * runs on the driver between micro-batches, so the history
    * evolution is race-free by the engine's serial-batch contract. */
  def start(docs: DataFrame)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) => sink(processBatch(b), id) }
      .start()
}

/** Restart persistence for the near-dup ingest's history state
  * (round-12 task 3): `currentHistory` lives only in the driver — a
  * crash loses it unless the caller persists it. These helpers make
  * that durable as a BUCKETED parquet table (bucketed + sorted on id,
  * the screen join's key, so a large restored history joins without a
  * shuffle on its side) and restore it for a resumed ingest.
  * Restart parity — resumed run ≡ unbroken run on the same batch
  * grouping — is pinned by NearDupIngestSpec. */
object NearDupIngest {

  /** Persist the accumulated (id, sig) history. Overwrites the table:
    * the history is cumulative, so each save is a full snapshot — the
    * row count is bounded by ACCEPTED docs (16 longs ≈ 128 B each),
    * not the corpus. Call after the stream stops (or periodically from
    * the sink for tighter crash windows: the screen is idempotent, so
    * re-processing a batch after an older snapshot only re-accepts the
    * same docs). */
  def saveHistory(history: DataFrame, table: String, path: String,
                  buckets: Int = 32): Unit =
    // localCheckpoint severs lineage BEFORE the overwrite: a history
    // restored via loadHistory(table) and saved back to the same table
    // with no processBatch in between (whose own localCheckpoint
    // normally cuts the chain) would otherwise still READ the table it
    // overwrites — Spark rejects that ("Cannot overwrite a table that
    // is also being read from"). Eager materialization here is cheap:
    // the history is bounded by accepted docs (~128 B each).
    history.select("id", "sig").localCheckpoint()
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, "id").sortBy("id")
      .format("parquet")
      .saveAsTable(table)

  /** Restore a persisted history for a resumed ingest — pass as
    * `initialHistory` to a fresh [[NearDupIngest]]. Reading via the
    * table (not the bare path) keeps the bucket metadata, so the
    * restored side of the screen join stays shuffle-free. */
  def loadHistory(spark: SparkSession, table: String): DataFrame =
    spark.table(table).select("id", "sig")
}
