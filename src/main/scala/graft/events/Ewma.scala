package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average over per-key ordered series.
  *
  * EWMA is a true recurrence (y_i = (1−α)·y_{i−1} + α·x_i, seeded
  * y_1 = x_1), which no SQL window expresses: a window sum of
  * α(1−α)^{n−i} weights either truncates the tail or pushes (1−α)^{−i}
  * into overflow. Instead each key's series is collected into ONE
  * ordered array and folded sequentially with the higher-order
  * `aggregate` function — the fold order is the series order, so the
  * result is bit-deterministic and matches any engine that replays the
  * same recurrence (the DuckDB oracle is a recursive CTE executing the
  * identical update expression — the q53/q80 replay technique).
  *
  * Scale contract: the per-key payload is the BUCKETED series (daily /
  * hourly aggregates), calendar-bounded and independent of fact volume
  * — a 10-year daily series is 3,653 elements. The recurrence is
  * inherently serial per key; parallelism comes from the keys, which is
  * the only axis that grows at 100 TB. Facts must be pre-aggregated to
  * bucket grain by the caller (the catalog entry does), exactly as for
  * [[graft.ml.TrendStats]] and the changepoint scan.
  */
object Ewma {

  /** Final EWMA value per key: (key, n BIGINT, ewma_last 6-dp).
    * `orderCol` must be unique per key (array_sort on (t, x) structs
    * then gives one deterministic order); `alpha` in (0, 1]. */
  def ewmaLast(series: DataFrame, key: String, orderCol: String,
               value: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val arr = array_sort(collect_list(struct(col(orderCol).as("t"),
      col(value).cast("double").as("x"))))
    series.groupBy(col(key))
      .agg(count(lit(1)).as("n"), arr.as("__arr"))
      .withColumn("ewma_last", round(
        aggregate(
          slice(col("__arr"), lit(2), size(col("__arr")) - 1),
          element_at(col("__arr"), 1).getField("x"),
          (acc, e) =>
            lit(1.0 - alpha) * acc + lit(alpha) * e.getField("x")),
        6))
      .drop("__arr")
  }

  /** Holt linear-trend double exponential smoothing: final (level,
    * trend) state and the one-step forecast per key.
    *
    * Recurrence (t ≥ 2, seeded l₁ = x₁, b₁ = 0 — the "known, zero
    * initial trend" convention, so a 1-point series needs no special
    * case): l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1});
    * b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}. Like [[ewmaLast]] this is
    * a true two-state recurrence no window expresses; the fold runs the
    * higher-order `aggregate` over one ordered array per key with a
    * STRUCT accumulator. Cross-engine caution: 1−α is evaluated as the
    * runtime double `1.0 - α` (NOT a pre-simplified decimal literal) and
    * the oracle spells the identical `(1.0::DOUBLE - α::DOUBLE)` —
    * decimal-simplifying to `0.7` yields a DIFFERENT nearest double and
    * the drift compounds per step.
    *
    * Output: (key, n, level 6-dp, trend 6-dp, forecast_next 6-dp).
    * Same scale contract as [[ewmaLast]]: per-key payload is the
    * calendar-bounded bucket series, parallelism is the key axis. */
  def holtForecast(series: DataFrame, key: String, orderCol: String,
                   value: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    val a = lit(alpha)
    val oneA = lit(1.0) - lit(alpha)
    val bta = lit(beta)
    val oneB = lit(1.0) - lit(beta)
    val arr = array_sort(collect_list(struct(col(orderCol).as("t"),
      col(value).cast("double").as("x"))))
    series.groupBy(col(key))
      .agg(count(lit(1)).as("n"), arr.as("__arr"))
      .withColumn("__fin",
        aggregate(
          slice(col("__arr"), lit(2), size(col("__arr")) - 1),
          struct(
            element_at(col("__arr"), 1).getField("x").as("l"),
            lit(0.0).as("b")),
          (acc, e) => {
            val lNew = a * e.getField("x") +
              oneA * (acc.getField("l") + acc.getField("b"))
            struct(
              lNew.as("l"),
              (bta * (lNew - acc.getField("l")) +
                oneB * acc.getField("b")).as("b"))
          }))
      .select(col(key), col("n"),
        round(col("__fin").getField("l"), 6).as("level"),
        round(col("__fin").getField("b"), 6).as("trend"),
        round(col("__fin").getField("l") + col("__fin").getField("b"), 6)
          .as("forecast_next"))
  }
}
