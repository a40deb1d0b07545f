package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted (trapezoidal) aggregation of an irregularly sampled
  * series: the mean of the piecewise-linear interpolant, i.e.
  * Σ (vᵢ + vᵢ₊₁)/2 · (tᵢ₊₁ − tᵢ) / (tₙ − t₀) per key. The arithmetic
  * mean of irregular samples over-weights bursts (ten readings in one
  * minute count ten times a reading that held for an hour); the
  * trapezoid weights each sample by the time it was in force — the
  * correct summary for sensor gauges, account balances, and any
  * sampled-on-change telemetry.
  *
  * Plan: one per-key window (lead) + one hash aggregate, both on the
  * same key shuffle — AQE-coalesced to a single Exchange. Keys with a
  * single sample (or all samples at one instant) have a zero-width
  * support and no defined mean; they are dropped, not NaN-filled.
  */
object TimeWeighted {

  /** Per-key trapezoidal mean of `value` over the `ts` axis (integral
    * units, e.g. epoch millis). `tieBreak` orders simultaneous samples
    * deterministically. Output: (key, twa DOUBLE rounded 4dp,
    * n_samples BIGINT), ordered by key. */
  def trapezoidalMean(df: DataFrame, key: String, ts: String,
                      value: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col(tieBreak).asc)
    df.select(col(key), col(ts), col(value), col(tieBreak))
      .withColumn("__nt", lead(col(ts), 1).over(w))
      .withColumn("__nv", lead(col(value), 1).over(w))
      .groupBy(col(key))
      .agg(
        round(
          sum((col(value) + col("__nv")) * lit(0.5) *
            (col("__nt") - col(ts))) /
            (max(col(ts)) - min(col(ts))), 4).as("twa"),
        count(lit(1)).as("n_samples"),
        (max(col(ts)) - min(col(ts))).as("__span"))
      .filter(col("__span") > 0)
      .drop("__span")
      .orderBy(col(key))
  }

  /** Exponential time-decay engagement score: Σ value·2^(−age/halfLife)
    * per key, age in whole days before `asOf` — the recency-weighted
    * activity metric behind churn risk and feature stores ("a click
    * last week counts half a click this week" at halfLife = 7). The
    * decay is computed as exp(ln½ · age/halfLife) with ln½ a single
    * double constant, so an oracle embeds the identical literal. One
    * map-side-combinable aggregate. Output per key: (key, n_events,
    * decay_score 4dp, last_ts).
    */
  def decayScore(df: DataFrame, key: String, ts: String, value: String,
                 halfLifeDays: Double, asOf: String): DataFrame = {
    require(halfLifeDays > 0, "halfLifeDays must be positive")
    val age = datediff(lit(asOf).cast("date"), to_date(col(ts)))
      .cast("double")
    val wgt = exp(lit(math.log(0.5)) * age / lit(halfLifeDays))
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(value) * wgt), 4).as("decay_score"),
        max(col(ts)).as("last_ts"))
  }
}
