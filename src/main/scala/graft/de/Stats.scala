package graft.de

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.gfunctions._

/** Statistical transforms for differential expression: Benjamini–Hochberg
  * FDR adjustment (A8, `pipeline2.py:619-629` / statsmodels `fdr_bh`) and
  * the Welch t-test assembled from per-group sufficient statistics (A6+A7).
  */
object Stats {

  /** Benjamini–Hochberg adjusted p-values.
    *
    * Matches `statsmodels.stats.multitest.multipletests(method='fdr_bh')`:
    * over the m non-null p's, adj_i = min(1, cummin_{j>=i}(p_j * m / j))
    * with j the ascending p-rank. Null/NaN p's are excluded from m and get
    * a null adjusted value (`pipeline2.py:620-627`).
    *
    * Scale note: the rank and reverse-cummin run in a single global window
    * ordered by p — a single-partition sort. That is safe here because BH is
    * applied after heavy per-gene aggregation (row count = number of tested
    * genes, bounded in the millions, not the raw 100 TB). `tieBreak` makes
    * the rank deterministic under tied p's; tied p's receive identical
    * adjusted values regardless of tie order (the reverse cummin equalizes
    * them), so the tie-break only stabilizes intermediate ranks.
    */
  def bhAdjust(df: DataFrame, pCol: String, outCol: String,
               tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val p = col(pCol)
    val bad = p.isNull || isnan(p)
    val invalid = df.filter(bad).withColumn(outCol, lit(null).cast("double"))
    val valid = df.filter(!bad)
    // m via 1-row cross join: no single-partition pass over the data just to
    // count, and keeps the count reusable by Catalyst.
    val m = valid.agg(count(lit(1)).cast("double").as("__bh_m"))
    val wAsc = Window.orderBy((p.asc +: tieBreak.map(col(_).asc)): _*)
    val ranked = valid.crossJoin(m)
      .withColumn("__bh_rk", row_number().over(wAsc))
    val wDesc = Window.orderBy(col("__bh_rk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn(outCol,
        least(lit(1.0), min(p * col("__bh_m") / col("__bh_rk")).over(wDesc)))
      .drop("__bh_rk", "__bh_m")
      .unionByName(invalid)
  }

  /** Welch t-test over a long-form (key..., group, value) DataFrame.
    *
    * One hash aggregation computes per-(key, group) sufficient statistics
    * (partial + final, map-side combine for free); the two groups are then
    * pivoted with conditional aggregates — no self-join, no shuffle beyond
    * the one groupBy. Output: keyCols, mean_case, mean_control, log2fc
    * (mean_case - mean_control, valid on standardized log-scale data,
    * `pipeline2.py:594-596`), t_stat, t_df, pvalue.
    *
    * caseVal/controlVal select the two groups; rows with other group values
    * are ignored (matches the reference, which only reads the case/control
    * sample columns).
    */
  def welchTTest(df: DataFrame, keyCols: Seq[String], groupCol: String,
                 valueCol: String, caseVal: String = "case",
                 controlVal: String = "control"): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val stats = df
      .filter(g === caseVal || g === controlVal)
      .groupBy(keyCols.map(col): _*)
      .agg(
        avg(when(g === caseVal, v)).as("mean_case"),
        var_samp(when(g === caseVal, v)).as("var_case"),
        count(when(g === caseVal, v)).as("n_case"),
        avg(when(g === controlVal, v)).as("mean_control"),
        var_samp(when(g === controlVal, v)).as("var_control"),
        count(when(g === controlVal, v)).as("n_control"))
    val t = welch_t(col("mean_case"), col("var_case"), col("n_case"),
      col("mean_control"), col("var_control"), col("n_control"))
    val tdf = welch_df(col("var_case"), col("n_case"),
      col("var_control"), col("n_control"))
    stats
      .withColumn("log2fc", nan_inf_to_null(col("mean_case") - col("mean_control")))
      .withColumn("t_stat", t)
      .withColumn("t_df", tdf)
      .withColumn("pvalue", t_test_pvalue(col("t_stat"), col("t_df")))
      .drop("var_case", "var_control")
  }
}
