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

  /** Graded ranking evaluation per query: nDCG@k with the
    * (2^rel − 1)/log2(pos + 1) gain (Järvelin & Kekäläinen 2002), MRR
    * over items with rel ≥ `relThreshold`, and precision@k at the same
    * threshold. Rankings order by (score desc, id asc) and the ideal
    * ranking by (rel desc, id asc) — both total orders, so every
    * metric is deterministic. Two windows per query over
    * query-bounded candidate lists; one aggregate. Output per query:
    * (query, n_docs, dcg 6dp, idcg 6dp, ndcg 6dp, mrr 6dp,
    * p_at_k 4dp). Queries with no relevant item get null mrr and
    * ndcg = null when idcg = 0.
    */
  def ndcgAtK(df: DataFrame, queryCol: String, idCol: String,
              relCol: String, scoreCol: String, k: Int,
              relThreshold: Double = 2.0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val wScore = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val wIdeal = Window.partitionBy(col(queryCol))
      .orderBy(col(relCol).desc, col(idCol).asc)
    val rel = col(relCol).cast("double")
    val gain = pow(lit(2.0), rel) - 1.0
    val ranked = df
      .withColumn("__pos", row_number().over(wScore))
      .withColumn("__ipos", row_number().over(wIdeal))
    ranked.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__pos") <= k,
          gain / log2(col("__pos") + 1))).as("__dcg"),
        sum(when(col("__ipos") <= k,
          gain / log2(col("__ipos") + 1))).as("__idcg"),
        min(when(rel >= relThreshold, col("__pos"))).as("__first"),
        sum(when(col("__pos") <= k && rel >= relThreshold, 1L)
          .otherwise(0L)).as("__hits"))
      .select(col(queryCol), col("n_docs"),
        round(col("__dcg"), 6).as("dcg"),
        round(col("__idcg"), 6).as("idcg"),
        round(col("__dcg") / nullif(col("__idcg"), lit(0.0)), 6)
          .as("ndcg"),
        round(lit(1.0) / col("__first"), 6).as("mrr"),
        round(col("__hits").cast("double") / k, 4).as("p_at_k"))
  }
}
