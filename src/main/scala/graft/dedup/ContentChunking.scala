package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.gfunctions.md5_long
import graft.text.TextAnalysis

/** Content-defined chunking — the storage-dedup segmentation trick
  * (Gear/FastCDC family: Xia et al. 2016) at TOKEN granularity:
  * chunk boundaries are placed where a rolling hash of the recent
  * token window hits a mask, so an insertion early in a document
  * shifts only the chunk it lands in — where fixed-width windows
  * (L28 chunking) re-cut everything downstream. At corpus scale this
  * is the segment-grain boilerplate detector: identical chunk hashes
  * across documents = shared template mass that survives doc-level
  * near-dedup.
  *
  * Token grain, not bytes, deliberately: tokens (`\S+` runs) are the
  * one segmentation both engines — and any replayer — agree on
  * byte-for-byte, immune to the UTF-16-vs-codepoint char-splitting
  * trap, and they match what a text pipeline deduplicates anyway.
  *
  * All arithmetic is EXACT 64-bit integer: per-token gear value
  * g = md5_long(token) & 0xFFFFFFFF (32-bit, so the 48-bit rolling
  * state can never overflow a BIGINT on any engine), rolling
  * h' = ((h << 1) + g) & (2^48 − 1) — the shift-out self-windows the
  * hash over the last 48 tokens. No float exists anywhere in the
  * boundary decision, so cross-engine chunk identity is bit-exact.
  */
object ContentChunking {

  /** Chunk every document's token stream. Boundary rule (part of the
    * replay contract): a chunk CLOSES at token position p when at
    * least `minTokens` tokens have accumulated since the last
    * boundary AND (h & (2^maskBits − 1)) == 0, or unconditionally at
    * `maxTokens`; the document end always closes the final partial
    * chunk. The rolling hash is NOT reset at boundaries (it
    * self-windows — stated; resetting would make chunking depend on
    * cut history, losing the shift-resilience the technique exists
    * for).
    *
    * Output, chunk grain: (id, chunk_idx 1-based, start_tok 1-based,
    * n_toks, chunk_hash = md5 of the single-space-joined token
    * slice — a canonical form both engines rebuild identically).
    * Documents with zero tokens emit nothing. Per-doc cost is linear
    * in tokens; the fold runs inside the row (no shuffle beyond the
    * doc scan). */
  def contentDefinedChunks(docs: DataFrame, idCol: String,
                           textCol: String, maskBits: Int = 4,
                           minTokens: Int = 8,
                           maxTokens: Int = 64): DataFrame = {
    require(maskBits >= 1 && maskBits <= 24, "maskBits in [1,24]")
    require(minTokens >= 1, "minTokens must be >= 1")
    require(maxTokens > minTokens, "maxTokens must exceed minTokens")
    val mask = lit((1L << maskBits) - 1L)
    val h48 = lit((1L << 48) - 1L)
    val toks = TextAnalysis.tokens(col(textCol))
    val withToks = docs.select(col(idCol).as("__id"), toks.as("__t"))
      .filter(size(col("__t")) > 0)
    // fold state: (h, runLen, ends array); ends = 1-based positions
    // where a chunk closes
    val folded = withToks.withColumn("__st",
      aggregate(
        zip_with(col("__t"), sequence(lit(1), size(col("__t"))),
          (tk, p) => struct(tk.as("tk"), p.as("p"))),
        struct(lit(0L).as("h"), lit(0).as("run"),
          array().cast("array<int>").as("ends")),
        (acc, e) => {
          val g = md5_long(e.getField("tk"))
            .bitwiseAND(lit(0xFFFFFFFFL))
          val h = shiftleft(acc.getField("h"), 1).plus(g)
            .bitwiseAND(h48)
          val run = acc.getField("run") + 1
          val cut = (run >= minTokens &&
            h.bitwiseAND(mask) === 0L) || run >= maxTokens
          struct(
            h.as("h"),
            when(cut, lit(0)).otherwise(run).as("run"),
            when(cut,
              concat(acc.getField("ends"),
                array(e.getField("p").cast("int"))))
              .otherwise(acc.getField("ends")).as("ends"))
        }))
      // close the final partial chunk at the document end
      .withColumn("__ends",
        when(col("__st.run") > 0,
          concat(col("__st.ends"),
            array(size(col("__t")).cast("int"))))
          .otherwise(col("__st.ends")))
    folded
      .select(col("__id"), col("__t"), col("__ends"),
        posexplode(col("__ends")).as(Seq("__i", "__end")))
      // posexplode's __i is 0-based; chunk i starts one past chunk
      // i-1's end (ANSI-safe: element_at(_, 0) is never evaluated)
      .withColumn("__start",
        when(col("__i") === 0, lit(1))
          .otherwise(element_at(col("__ends"), col("__i")) + 1)
          .cast("int"))
      .select(col("__id").as(idCol),
        (col("__i") + 1).cast("long").as("chunk_idx"),
        col("__start").cast("long").as("start_tok"),
        (col("__end") - col("__start") + 1).cast("long").as("n_toks"),
        md5(concat_ws(" ",
          slice(col("__t"), col("__start"),
            col("__end") - col("__start") + 1)))
          .as("chunk_hash"))
  }
}
