package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over right-censored durations —
  * the retention-curve estimator ("what fraction of users/subjects
  * survive past t") that handles still-active subjects correctly where
  * a naive survival fraction over-counts churn.
  *
  * Input grain is one row per SUBJECT (duration, event 1/0); output
  * grain is one row per DISTINCT duration — so after the first
  * aggregate everything is bounded by the duration domain, never the
  * subject count (the gate-sweep/BH-small-branch scale shape). Both
  * windows share one (global) sort over that collapsed table.
  *
  * Cross-engine determinism: n_risk/n_event/n_censored are exact
  * integers; Ŝ(t) = Π_{tⱼ≤t, dⱼ>0} (nⱼ−dⱼ)/nⱼ is evaluated as
  * exp(Σ ln(·)) where the cumulative sum runs in the SAME deterministic
  * duration order on both engines, so the doubles agree bit-for-bit
  * before the 6-dp round. The Π→0 edge (everyone at risk dies at the
  * last event time) would be ln 0 → null under Spark's non-ANSI `log`,
  * so it is special-cased via the running minimum of (nⱼ−dⱼ).
  */
object Survival {

  /** KM table: (t, n_risk, n_event, n_censored, survival). `df` has one
    * row per subject with a non-negative integer duration and event
    * flag (1 = observed terminal event, 0 = right-censored). */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val byT = df.groupBy(col(durationCol).as("t"))
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("n_event"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("n_censored"))
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // At-risk at t = subjects whose duration >= t = total − (all rows
    // strictly before t).
    val wAll = Window.partitionBy()
    byT
      .withColumn("n_risk",
        sum(col("n_event") + col("n_censored")).over(wAll) -
          coalesce(sum(col("n_event") + col("n_censored")).over(wPrev),
            lit(0L)))
      .withColumn("__lnterm",
        when(col("n_event") === 0 || col("n_event") === col("n_risk"),
          lit(0.0))
          .otherwise(log((col("n_risk") - col("n_event"))
            .cast("double") / col("n_risk"))))
      .withColumn("__dead",
        min(when(col("n_event") === col("n_risk") && col("n_event") > 0,
          0L).otherwise(1L)).over(wAsc))
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censored"),
        when(col("__dead") === 0, lit(0.0))
          .otherwise(round(exp(sum(col("__lnterm")).over(wAsc)), 6))
          .as("survival"))
  }
}
