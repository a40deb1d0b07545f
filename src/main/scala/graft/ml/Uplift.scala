package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Uplift-model evaluation (X322) — does targeting by a score find the
  * units whose OUTCOME the treatment actually changes? A/B readouts
  * (q260/q372) answer "did treatment work on average"; the Qini curve
  * answers "does this score rank the persuadables first", the readout
  * incremental-marketing and churn-save models are chosen by
  * (Radcliffe 2007).
  */
object Uplift {

  /** Qini curve at score-bucket grain: units sort by descending score
    * bucket (bucket = round(score, bucketDp) — a bounded domain by
    * construction, ≤ 10^bucketDp·range + 1 values, the no-global-sort
    * convention); at each depth the cumulative incremental conversions
    * are qini = cumConv_t − cumConv_c · cumN_t / cumN_c (treated
    * conversions minus the control conversions scaled to the treated
    * volume). Every cumulative is an exact integer; the only float per
    * row is the final scaling — no accumulation-order noise.
    *
    * Complete-case on treat/outcome/score (the ranked-axis contract:
    * a null score has no depth position; a null outcome is
    * unjudgeable). Shape: one fact aggregate to bucket grain, then
    * cumulative windows over the bounded bucket table (single
    * partition by design — bucket-grain, never facts). Output per
    * bucket, descending: (bucket, n_treated, n_control, conv_treated,
    * conv_control BIGINT, cum_n_treated, cum_n_control,
    * cum_conv_treated, cum_conv_control BIGINT, qini 4dp — null until
    * the first control unit appears). */
  def qiniCurve(df: DataFrame, treatCol: String, outcomeCol: String,
                scoreCol: String, bucketDp: Int = 1): DataFrame = {
    require(bucketDp >= 0 && bucketDp <= 4, "bucketDp in [0,4]")
    val t = col(treatCol).cast("int")
    val y = col(outcomeCol).cast("int")
    val base = df
      .filter(t.isNotNull && y.isNotNull && col(scoreCol).isNotNull)
      .select(round(col(scoreCol), bucketDp).as("bucket"),
        t.as("__t"), y.as("__y"))
    val cells = base.groupBy(col("bucket"))
      .agg(sum(when(col("__t") === 1, 1L).otherwise(0L))
          .as("n_treated"),
        sum(when(col("__t") === 0, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("__t") === 1, col("__y")).otherwise(0))
          .cast("long").as("conv_treated"),
        sum(when(col("__t") === 0, col("__y")).otherwise(0))
          .cast("long").as("conv_control"))
    val wCum = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qini = col("cum_conv_treated").cast("double") -
      col("cum_conv_control").cast("double") *
        col("cum_n_treated") / nullif(col("cum_n_control"), lit(0L))
    cells
      .withColumn("cum_n_treated", sum(col("n_treated")).over(wCum))
      .withColumn("cum_n_control", sum(col("n_control")).over(wCum))
      .withColumn("cum_conv_treated",
        sum(col("conv_treated")).over(wCum))
      .withColumn("cum_conv_control",
        sum(col("conv_control")).over(wCum))
      .withColumn("qini", round(qini, 4))
  }
}
