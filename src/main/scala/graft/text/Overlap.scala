package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Verbatim-overlap SPAN localization between a corpus and an eval set
  * — contamination at span grain. The n-gram-fraction detectors
  * (Decontaminate) answer "how much eval content leaks into this doc";
  * this answers "WHERE, and how LONG is the longest verbatim run" —
  * the quantity that separates a quoted sentence from a wholesale
  * benchmark copy.
  *
  * Method (pure relational, no suffix structures):
  *  1. k-token anchors with positions on both sides
  *     (`concat_ws(slice(tokens, i, k))` per position).
  *  2. df-cap the CORPUS anchor side (boilerplate k-grams appear
  *     everywhere; true verbatim copies are rare anchors — the q258
  *     containment discipline, dropped counts loggable by the caller).
  *  3. Join on anchor (eval side is benchmark-sized by definition →
  *     broadcast); every match lands on a DIAGONAL
  *     d = corpus_pos − eval_pos.
  *  4. Consecutive matched positions on one diagonal are one verbatim
  *     run: gaps-and-islands per (corpus_id, eval_id, d) — island id =
  *     eval_pos − row_number() over the diagonal — then the longest
  *     island + k − 1 is the span length in tokens.
  *
  * Scale: anchor explode is linear in tokens; the join is
  * candidate-proportional under the df cap; the islands window runs
  * per (corpus_id, eval_id, diagonal) — fine-grained keys, bounded by
  * the matched anchors of one document pair. 100 TB corpus × bounded
  * eval = broadcast join, no corpus shuffle at all.
  */
object Overlap {

  /** Longest verbatim run per (corpus doc, eval doc) pair sharing at
    * least one rare anchor: (corpus_id, eval_id, n_anchor_hits,
    * max_span_tokens). k = anchor width in tokens; maxAnchorDf = corpus
    * df cap per anchor. */
  def verbatimSpans(corpus: DataFrame, corpusId: String, corpusText: String,
                    eval: DataFrame, evalId: String, evalText: String,
                    k: Int = 5, maxAnchorDf: Long = 20L): DataFrame = {
    require(k >= 2, s"anchor width k must be >= 2, got $k")
    require(maxAnchorDf >= 1, "maxAnchorDf must be >= 1")
    def anchors(df: DataFrame, id: String, text: String,
                idOut: String, posOut: String): DataFrame = {
      val toks = TextAnalysis.tokens(col(text))
      df.select(col(id).as(idOut), toks.as("__t"))
        .filter(size(col("__t")) >= k)
        .select(col(idOut), posexplode(
          transform(sequence(lit(1), size(col("__t")) - (k - 1)),
            i => concat_ws(" ", slice(col("__t"), i, lit(k))))))
        .select(col(idOut), (col("pos") + 1).as(posOut),
          col("col").as("__a"))
    }
    val ca = anchors(corpus, corpusId, corpusText, "corpus_id", "c_pos")
    val ea = anchors(eval, evalId, evalText, "eval_id", "e_pos")
    // df-cap on the corpus side: a boilerplate anchor in thousands of
    // docs is not contamination evidence, and dropping it keeps the
    // join candidate-proportional
    val rare = ca.withColumn("__df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__a"))))
      .filter(col("__df") <= maxAnchorDf).drop("__df")
    val hits = rare.join(broadcast(ea), Seq("__a"))
      .select(col("corpus_id"), col("eval_id"),
        col("c_pos"), col("e_pos"),
        (col("c_pos") - col("e_pos")).as("__d"))
    // gaps-and-islands per diagonal: consecutive e_pos = one run
    val wDiag = org.apache.spark.sql.expressions.Window
      .partitionBy(col("corpus_id"), col("eval_id"), col("__d"))
      .orderBy(col("e_pos"))
    hits
      .withColumn("__isl", col("e_pos") - row_number().over(wDiag))
      .groupBy(col("corpus_id"), col("eval_id"), col("__d"), col("__isl"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col("corpus_id"), col("eval_id"))
      .agg(sum(col("__run")).cast("long").as("n_anchor_hits"),
        (max(col("__run")) + (k - 1)).cast("long").as("max_span_tokens"))
  }
}
