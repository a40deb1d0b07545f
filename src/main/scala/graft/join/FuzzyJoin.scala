package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked edit-distance (fuzzy) join — entity-resolution extension of
  * the join family ([[AsOfJoin]], [[RangeJoin]]).
  *
  * Candidate pairs must share a blocking key (character prefix of the
  * match column) and pass a length band (|len(a) − len(b)| ≤ maxDist —
  * a true lower bound on edit distance); survivors are verified with
  * `levenshtein` (codegen'd built-in, no UDF). Blocking is the standard
  * recall/cost trade of entity resolution: pairs that differ inside the
  * prefix are missed, and recall is recovered in practice by unioning
  * passes over different blocking keys (prefix, reversed prefix,
  * phonetic key) — each pass is this same operator.
  *
  * Scale: one shuffle on the blocking key; per-block work is |block|².
  * Prefix blocks follow text frequency, so a hot prefix (e.g. a common
  * brand word) is the skew risk — lengthen the prefix or salt hot blocks
  * (see [[SkewJoin]]) rather than accepting one straggler task. The
  * length band is applied inside the block before levenshtein so the
  * quadratic verify only pays for plausible pairs.
  */
object FuzzyJoin {

  /** Self-join `df` on fuzzy equality of `text`: pairs (id_a, id_b,
    * text_a, text_b, dist INT) with id_a < id_b, same `prefixLen`-char
    * block, and levenshtein ≤ maxDist. `id` must be unique per row. */
  def selfBlockedLevenshtein(df: DataFrame, id: String, text: String,
                             maxDist: Int, prefixLen: Int): DataFrame = {
    val a = df.select(col(id).as("id_a"), col(text).as("text_a"),
      substring(col(text), 1, prefixLen).as("__blk"),
      length(col(text)).as("__len_a"))
    val b = df.select(col(id).as("id_b"), col(text).as("text_b"),
      substring(col(text), 1, prefixLen).as("__blk"),
      length(col(text)).as("__len_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("__len_a") - col("__len_b")) <= maxDist)
      .withColumn("dist", levenshtein(col("text_a"), col("text_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("text_a"), col("text_b"),
        col("dist"))
  }

  /** Two-table variant: every `left` row paired with the `right` rows in
    * its block within `maxDist` edits. Column names are taken from the
    * inputs with `_l`/`_r` suffixes on the id and text columns. */
  def blockedLevenshtein(left: DataFrame, right: DataFrame,
                         id: String, text: String,
                         maxDist: Int, prefixLen: Int): DataFrame = {
    val a = left.select(col(id).as(s"${id}_l"), col(text).as(s"${text}_l"),
      substring(col(text), 1, prefixLen).as("__blk"),
      length(col(text)).as("__len_l"))
    val b = right.select(col(id).as(s"${id}_r"), col(text).as(s"${text}_r"),
      substring(col(text), 1, prefixLen).as("__blk"),
      length(col(text)).as("__len_r"))
    a.join(b, Seq("__blk"))
      .filter(abs(col("__len_l") - col("__len_r")) <= maxDist)
      .withColumn("dist",
        levenshtein(col(s"${text}_l"), col(s"${text}_r")))
      .filter(col("dist") <= maxDist)
      .select(col(s"${id}_l"), col(s"${id}_r"), col(s"${text}_l"),
        col(s"${text}_r"), col("dist"))
  }
}
