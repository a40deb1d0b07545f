package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared join shapes with subtle semantics, hoisted so the lesson is
  * learned once. */
object Joins {

  /** NULL-SAFE equi-join of fact rows against a per-group stats frame
    * on `keys`: groupBy emits a stats row for the null-valued group,
    * but a plain equi-join back would silently drop exactly those fact
    * rows (null != null). Used by the numeric screens
    * (robustOutlierStats/winsorizedStats) and the k-anonymity
    * suppression filter. Output: every fact column (original order)
    * followed by the stats frame's non-key columns; inner semantics on
    * the null-safe condition (every fact row matches its group's stats
    * row by construction).
    */
  def nullSafeStatsJoin(df: DataFrame, stats: DataFrame,
                        keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val l = df.alias("__l")
    val s = stats.alias("__s")
    // backtick-quote so a column name containing a dot stays one
    // identifier instead of parsing as a nested-field path
    val cond = keys.map(c => col(s"__l.`$c`") <=> col(s"__s.`$c`"))
      .reduce(_ && _)
    val statCols = stats.columns.filterNot(keys.contains)
    l.join(s, cond).select(
      df.columns.map(c => col(s"__l.`$c`")) ++
        statCols.map(c => col(s"__s.`$c`")): _*)
  }
}
