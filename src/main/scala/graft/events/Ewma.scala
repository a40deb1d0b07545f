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

  /** Holt–Winters ADDITIVE seasonal (triple exponential) smoothing:
    * final (level, trend, next-season term) state and the one-step
    * forecast per key, season length `m`.
    *
    * Seed convention (documented so any engine can replay it): the
    * first m observations initialize l = mean(x₁..x_m) (summed LEFT TO
    * RIGHT — the fold order is part of the contract), b = 0, and
    * s_j = x_j − l; the recurrence runs from observation m+1:
    * l_t = α(x_t − s_{t−m}) + (1−α)(l + b);
    * b_t = β(l_t − l) + (1−β)b;
    * s_t = γ(x_t − l_t) + (1−γ)s_{t−m}. The seasonal window rides the
    * STRUCT accumulator as an m-element array rotated per step —
    * state is (l, b, s[1..m]), which no SQL window expresses but both
    * the higher-order fold here and a recursive CTE carrying a LIST
    * column replay identically. Same 1−α runtime-double discipline as
    * [[holtForecast]].
    *
    * Keys with fewer than m+1 points yield null outputs (not enough
    * data to seed a season). Output: (key, n, level, trend,
    * season_next, forecast_next — all 6-dp; forecast_next =
    * l + b + s_{t+1−m}). Scale contract as [[ewmaLast]]: per-key
    * payload is the calendar-bounded bucket series. */
  def holtWinters(series: DataFrame, key: String, orderCol: String,
                  value: String, m: Int, alpha: Double, beta: Double,
                  gamma: Double): DataFrame = {
    require(m >= 2, s"season length must be >= 2, got $m")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    require(gamma >= 0 && gamma <= 1, s"gamma must be in [0,1], got $gamma")
    val a = lit(alpha); val oneA = lit(1.0) - lit(alpha)
    val bt = lit(beta); val oneB = lit(1.0) - lit(beta)
    val g = lit(gamma); val oneG = lit(1.0) - lit(gamma)
    val arr = array_sort(collect_list(struct(col(orderCol).as("t"),
      col(value).cast("double").as("x"))))
    val seedL = aggregate(
      transform(slice(col("__arr"), lit(1), lit(m)),
        e => e.getField("x")),
      lit(0.0), (acc, x) => acc + x) / lit(m.toDouble)
    series.groupBy(col(key))
      .agg(count(lit(1)).as("n"), arr.as("__arr"))
      .withColumn("__l0", seedL)
      .withColumn("__fin",
        when(col("n") <= m, lit(null))
          .otherwise(aggregate(
            // greatest-guard: slice length must be non-negative even on
            // the short-series rows the `when` will null out anyway
            slice(col("__arr"), lit(m + 1),
              greatest(size(col("__arr")) - m, lit(0))),
            struct(
              col("__l0").as("l"),
              lit(0.0).as("b"),
              transform(slice(col("__arr"), lit(1), lit(m)),
                e => e.getField("x") - col("__l0")).as("s")),
            (acc, e) => {
              val sHead = element_at(acc.getField("s"), 1)
              val lNew = a * (e.getField("x") - sHead) +
                oneA * (acc.getField("l") + acc.getField("b"))
              val bNew = bt * (lNew - acc.getField("l")) +
                oneB * acc.getField("b")
              val sNew = g * (e.getField("x") - lNew) + oneG * sHead
              struct(
                lNew.as("l"),
                bNew.as("b"),
                concat(slice(acc.getField("s"), 2, m - 1),
                  array(sNew)).as("s"))
            })))
      .select(col(key), col("n"),
        round(col("__fin").getField("l"), 6).as("level"),
        round(col("__fin").getField("b"), 6).as("trend"),
        round(element_at(col("__fin").getField("s"), 1), 6)
          .as("season_next"),
        round(col("__fin").getField("l") + col("__fin").getField("b") +
          element_at(col("__fin").getField("s"), 1), 6)
          .as("forecast_next"))
  }

  /** Croston's method for intermittent demand (Croston 1972): separate
    * exponential smoothing of nonzero demand SIZE (z) and the
    * INTERVAL between nonzero demands (p); forecast per period =
    * z/p. The standard spare-parts/slow-mover forecaster — plain EWMA
    * on a mostly-zero series collapses toward zero between demands,
    * Croston doesn't.
    *
    * Seed convention (part of the cross-engine contract): the FIRST
    * nonzero observation seeds z = x and p = its 1-based position;
    * thereafter each nonzero observation at gap q (periods since the
    * previous nonzero, ≥ 1) updates z' = αx + (1−α)z,
    * p' = αq + (1−α)p. Zero periods only advance the gap counter. The
    * state (z, p, q) rides a struct accumulator over one ordered
    * per-key array — the [[holtForecast]] fold shape, replayable by a
    * recursive CTE. 1−α stays the runtime double `1.0 - α` (same
    * discipline as Holt).
    *
    * Keys with no nonzero demand yield nulls. Output: (key, n,
    * n_demands, size_z 6dp, interval_p 6dp, forecast 6dp = z/p).
    */
  def croston(series: DataFrame, key: String, orderCol: String,
              value: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val a = lit(alpha)
    val oneA = lit(1.0) - lit(alpha)
    val arr = array_sort(collect_list(struct(col(orderCol).as("t"),
      col(value).cast("double").as("x"))))
    // state: z (smoothed size), p (smoothed interval), q (gap counter),
    // m (n_demands); z < 0 marks "not yet seeded".
    series.groupBy(col(key))
      .agg(count(lit(1)).as("n"), arr.as("__arr"))
      .withColumn("__fin",
        aggregate(
          col("__arr"),
          struct(lit(-1.0).as("z"), lit(0.0).as("p"), lit(0.0).as("q"),
            lit(0L).as("m")),
          (acc, e) => {
            val x = e.getField("x")
            val q1 = acc.getField("q") + lit(1.0)
            val unseeded = acc.getField("z") < 0
            struct(
              when(x === 0, acc.getField("z"))
                .when(unseeded, x)
                .otherwise(a * x + oneA * acc.getField("z")).as("z"),
              when(x === 0, acc.getField("p"))
                .when(unseeded, q1)
                .otherwise(a * q1 + oneA * acc.getField("p")).as("p"),
              when(x === 0, q1).otherwise(lit(0.0)).as("q"),
              when(x === 0, acc.getField("m"))
                .otherwise(acc.getField("m") + 1).as("m"))
          }))
      .select(col(key), col("n"),
        col("__fin").getField("m").as("n_demands"),
        when(col("__fin").getField("z") >= 0,
          round(col("__fin").getField("z"), 6)).as("size_z"),
        when(col("__fin").getField("z") >= 0,
          round(col("__fin").getField("p"), 6)).as("interval_p"),
        when(col("__fin").getField("z") >= 0,
          round(col("__fin").getField("z") / col("__fin").getField("p"), 6))
          .as("forecast"))
  }
}
