package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: the migration/backfill acceptance report
  * between two keyed datasets — which keys exist only on one side,
  * and of the shared keys, which disagree on which value columns.
  * ONE full-outer join on the key produces every statistic; per-column
  * mismatch counts are conditional aggregates over the joined frame
  * (no per-column joins). Null-safe equality (`<=>`) so null-vs-null
  * is a match and null-vs-value a mismatch — the semantics a diff
  * tool needs.
  */
object Reconcile {

  /** Output (one row): n_left, n_right, n_left_only, n_right_only,
    * n_both, n_matching (rows equal on every compared column),
    * n_mismatched, plus one `mismatch_<col>` count per compared
    * column. Keys must be unique per side (enforce upstream — a
    * reconciliation over duplicate keys is ill-posed).
    */
  def report(left: DataFrame, right: DataFrame, key: String,
             compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    // Presence is a literal marker projected per side BEFORE the join,
    // not inferred from key non-nullness after it: a row with a null
    // key still counts toward its side's total (it can never match —
    // null keys don't equi-join — but it must not vanish from n_left/
    // n_right, which reconcile against the input row counts).
    val l = left.select((key +: compareCols).map(c =>
      col(c).as(s"l_$c")) :+ lit(1).as("__in_l"): _*)
    val r = right.select((key +: compareCols).map(c =>
      col(c).as(s"r_$c")) :+ lit(1).as("__in_r"): _*)
    val j = l.join(r, col(s"l_$key") === col(s"r_$key"), "full_outer")
    val inL = col("__in_l").isNotNull
    val inR = col("__in_r").isNotNull
    val colEq = compareCols.map(c => col(s"l_$c") <=> col(s"r_$c"))
    val allEq = colEq.reduce(_ && _)
    val perCol = compareCols.map(c =>
      sum(when(inL && inR && !(col(s"l_$c") <=> col(s"r_$c")), 1L)
        .otherwise(0L)).as(s"mismatch_$c"))
    j.agg(
      sum(when(inL, 1L).otherwise(0L)).as("n_left"),
      (Seq(
        sum(when(inR, 1L).otherwise(0L)).as("n_right"),
        sum(when(inL && !inR, 1L).otherwise(0L)).as("n_left_only"),
        sum(when(!inL && inR, 1L).otherwise(0L)).as("n_right_only"),
        sum(when(inL && inR, 1L).otherwise(0L)).as("n_both"),
        sum(when(inL && inR && allEq, 1L).otherwise(0L)).as("n_matching"),
        sum(when(inL && inR && !allEq, 1L).otherwise(0L))
          .as("n_mismatched")) ++ perCol): _*)
  }
}
