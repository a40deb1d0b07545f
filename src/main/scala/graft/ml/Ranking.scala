package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality readouts for scored binary outcomes (X101/X102):
  * the precision–recall curve with average precision, and the decile
  * lift/gains table — the two charts every scoring-model review opens
  * with, next to q116's ROC AUC.
  *
  * Scale shape (the rocAuc discipline): facts collapse to one row per
  * DISTINCT score FIRST, so every cumulative window runs over the
  * score domain, not the row count — callers pre-round continuous
  * scores (the catalog uses 3-dp) to keep that domain bounded. All
  * curve inputs are exact BIGINT counts.
  */
object Ranking {

  /** PR curve at every distinct score threshold (predict positive when
    * score ≥ t, thresholds descending) plus AP — the step-integral
    * Σ (R_i − R_{i−1})·P_i over distinct thresholds (the sklearn
    * definition restricted to the collapsed score domain; identical
    * when scores are pre-rounded, which is the usage contract).
    * Output: (threshold, n_pred, tp, precision 4-dp, recall 4-dp,
    * avg_precision 4-dp — the same value on every row for easy
    * joining). `label` is 1/0. */
  def prCurve(df: DataFrame, labelCol: String,
              scoreCol: String): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("n_at"), sum(col(labelCol)).as("np_at"))
    val wDesc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = g
      .withColumn("n_pred", sum(col("n_at")).over(wDesc))
      .withColumn("tp", sum(col("np_at")).over(wDesc))
      .withColumn("__pos", sum(col("np_at")).over(wAll))
    val prec = col("tp").cast("double") / col("n_pred")
    val rec = col("tp").cast("double") / nullif(col("__pos"), lit(0L))
    val withPr = cum
      .withColumn("__prec", prec).withColumn("__rec", rec)
      .withColumn("__prevRec",
        coalesce(lag(col("__rec"), 1).over(
          Window.orderBy(col("threshold").desc)), lit(0.0)))
    val ap = withPr
      .withColumn("__apTerm", (col("__rec") - col("__prevRec")) *
        col("__prec"))
      .withColumn("avg_precision",
        round(sum(col("__apTerm")).over(wAll), 4))
    ap.select(col("threshold"), col("n_pred"), col("tp"),
      round(col("__prec"), 4).as("precision"),
      round(col("__rec"), 4).as("recall"),
      col("avg_precision"))
  }

  /** Decile gains/lift table: rank all rows by (score desc, tie-break
    * asc), cut into `nBins` equal-count bins by floor arithmetic (the
    * X54 quintile discipline — no ntile ambiguity), and report per-bin
    * and cumulative capture. Output: (bin 1..n, n_rows, n_pos,
    * bin_rate 4-dp, cum_pos, cum_capture 4-dp, cum_lift 4-dp =
    * cumulative rate / base rate). */
  def liftTable(df: DataFrame, labelCol: String, scoreCol: String,
                tieBreak: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2)
    val wRank = Window.orderBy(col(scoreCol).desc, col(tieBreak).asc)
    val wAll = Window.partitionBy()
    val ranked = df
      .withColumn("__r", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("bin",
        (((col("__r") - 1) * nBins / col("__n")) + 1).cast("long"))
    val byBin = ranked.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"), sum(col(labelCol)).as("n_pos"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBin
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("__cumN", sum(col("n_rows")).over(wCum))
      .withColumn("__totPos", sum(col("n_pos")).over(wAll))
      .withColumn("__totN", sum(col("n_rows")).over(wAll))
      .select(col("bin"), col("n_rows"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n_rows"), 4)
          .as("bin_rate"),
        col("cum_pos"),
        round(col("cum_pos").cast("double") /
          nullif(col("__totPos"), lit(0L)), 4).as("cum_capture"),
        round((col("cum_pos").cast("double") / col("__cumN")) /
          nullif(col("__totPos").cast("double") / col("__totN"),
            lit(0.0)), 4).as("cum_lift"))
  }
}
