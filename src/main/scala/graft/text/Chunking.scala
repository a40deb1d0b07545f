package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-length operators for training-data preparation: token-window
  * chunking (long documents → overlapping context windows) and
  * deterministic sequence packing (documents → fixed-token-budget
  * training sequences).
  *
  * Both are narrow per-row / per-group constructions: chunking fans out
  * each row by its own chunk count (no shuffle), packing is one running
  * sum windowed by the stratum key — never a global single-partition
  * window.
  */
object Chunking {

  /** Split each document into chunks of `chunkTokens` whitespace tokens
    * with `overlap` tokens of leading context. Chunk starts step by
    * chunkTokens - overlap; a chunk past the first must contribute at
    * least one token beyond its overlap (no fully-redundant tail chunk).
    * Output: (id, chunk_id, chunk_text, n_chunk_tokens), one row per
    * chunk; empty docs produce no rows. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens >= 1 and 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val toks = TextAnalysis.tokens(col(textCol))
    val nTok = size(toks)
    val starts = filter(
      when(nTok > 0, sequence(lit(0), nTok - 1, lit(step)))
        .otherwise(array().cast("array<int>")),
      s => s === 0 || s + overlap < nTok)
    df.select(col(idCol).as("id"), toks.as("__toks"),
        posexplode(starts).as(Seq("chunk_id", "__start")))
      .select(col("id"), col("chunk_id"),
        concat_ws(" ",
          slice(col("__toks"), col("__start") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), size(col("__toks")) - col("__start"))
          .as("n_chunk_tokens"))
  }

  /** Deterministic concatenate-and-split packing (the GPT-style
    * pipeline: concatenate the stratum's documents in id order, cut every
    * `budgetTokens`): seq_id = floor(exclusive-running-token-sum /
    * budget) is the training sequence in which the document's FIRST
    * token lands. Documents may straddle a cut — this labels where each
    * doc starts, it does not enforce per-sequence capacity (true greedy
    * bin packing is a sequential fold, not a window). Output adds
    * (n_tokens, seq_id).
    *
    * Precondition: idCol must be UNIQUE within each stratum — the running
    * sum's ROWS frame has no deterministic order among duplicate ids, so
    * duplicates would make seq_id run-dependent. */
  def packSequences(df: DataFrame, strataCol: String, idCol: String,
                    textCol: String, budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1, "budget must be >= 1")
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = TextAnalysis.tokenCount(col(textCol))
    df.withColumn("n_tokens", n.cast("long"))
      .withColumn("seq_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens"))
          / lit(budgetTokens)).cast("long"))
  }

  /** Padding-efficiency report for pad-to-`seqLen` batching (the
    * sibling of [[packSequences]]'s concat-and-split: when documents are
    * NOT concatenated, every doc pads its last chunk to the sequence
    * boundary, and this table says what that costs): per power-of-2
    * token-length bucket, document count, real tokens, padded slots
    * (ceil(n/seqLen)·seqLen), and the waste fraction — the table that
    * justifies switching to packing, or picking a different seqLen.
    * Empty docs (0 tokens) are excluded (they'd contribute no
    * sequences). One narrow scoring pass into a bounded aggregate
    * (≤ 64 buckets regardless of corpus size).
    *
    * Output: (len_bucket = floor(log2(n_tokens)), bucket_lo, n_docs,
    * total_tokens, padded_slots, waste_frac 4 dp), ascending.
    */
  def paddingEfficiency(df: DataFrame, textCol: String,
                        seqLen: Int): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val n = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val padded = ceil(n.cast("double") / seqLen).cast("long") * seqLen
    df.select(n.as("__n"), padded.as("__p"))
      .filter(col("__n") > 0)
      // epsilon-killing round before floor: ln(n)/ln(2) for an exact
      // power of 2 can land a hair under the integer, and the two
      // engines' libm need not err the same way (the q65 lesson). 9 dp:
      // wide enough to absorb ~1e-15 libm noise, narrow enough that a
      // genuine just-below-2^k count (log2 gap ≥ ~3e-7 at k=22) is
      // never rounded up into the wrong bucket.
      .groupBy(floor(round(log(2.0, col("__n")), 9)).cast("int")
        .as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("total_tokens"),
        sum(col("__p")).as("padded_slots"),
        round(lit(1.0) - sum(col("__n")).cast("double") /
          sum(col("__p")).cast("double"), 4).as("waste_frac"))
      .withColumn("bucket_lo", pow(lit(2.0), col("len_bucket")).cast("long"))
      .select(col("len_bucket"), col("bucket_lo"), col("n_docs"),
        col("total_tokens"), col("padded_slots"), col("waste_frac"))
      .orderBy(col("len_bucket"))
  }
}
