package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.gfunctions.md5_long

/** Training-data curation funnel readout (the q400 capstone as a
  * first-class operator): per source, how much survives each curation
  * stage — raw → exact-dedup survivors → quality survivors — and how
  * much token mass the survivors carry. The per-source accounting a
  * mixture/budget planner consumes (cf. the reference's summary-report
  * stage, `pipeline2.py:1118-1160`, which reports pipeline-stage
  * survivor counts the same way).
  *
  * Stages:
  *  - dedup: first doc_id per 128-bit content hash keeps the row (the
  *    [[graft.dedup.Dedup.exact]] keep-first rule — cross-SOURCE, so a
  *    duplicate charges the copying source, not the original);
  *  - quality: token count in [minTok, maxTok] and digit mass below
  *    maxDigitRatio of characters (the length/symbol screens of the
  *    C4/Gopher family).
  *
  * ONE hash-partitioned window (shuffle on the 16-byte hash; text
  * never re-scanned) + one per-source aggregate — at 100 TB the
  * shuffle carries (source, doc_id, hash, 3 ints) per row, not
  * documents. Output per source: n_raw, n_unique, n_quality,
  * tokens_out (all BIGINT). */
object Curation {

  def funnel(docs: DataFrame, sourceCol: String, idCol: String,
             textCol: String, minTok: Int = 20, maxTok: Int = 2000,
             maxDigitRatio: Double = 0.2): DataFrame = {
    require(minTok >= 0 && maxTok >= minTok, "0 <= minTok <= maxTok")
    require(maxDigitRatio > 0, "maxDigitRatio must be > 0")
    val base = docs.select(col(sourceCol).as("source"),
      col(idCol).as("__id"),
      size(TextAnalysis.tokens(col(textCol))).as("ntok"),
      regexp_count(col(textCol), lit("[0-9]")).as("ndig"),
      length(col(textCol)).as("nch"),
      md5_long(col(textCol)).as("h"))
    val w = Window.partitionBy(col("h")).orderBy(col("__id"))
    val keep: Column = row_number().over(w) === 1
    val quality: Column = col("ntok").between(minTok, maxTok) &&
      col("ndig") < col("nch") * maxDigitRatio
    base.withColumn("keep", keep)
      .withColumn("quality", quality)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("keep") && col("quality"), 1L).otherwise(0L))
          .as("n_quality"),
        sum(when(col("keep") && col("quality"), col("ntok"))
          .otherwise(0L)).cast("long").as("tokens_out"))
      .orderBy(col("source"))
  }
}
