package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kalman filtering for per-key time series — the probabilistic
  * sibling of [[Ewma]]'s fixed-gain smoothers. Where EWMA/Holt assume
  * a constant blend weight, the local-level Kalman filter carries the
  * posterior variance alongside the level and lets the gain adapt:
  * early observations move the estimate a lot (high P), later ones
  * less as the filter converges toward the steady-state gain — the
  * standard recursion every tracking/sensor pipeline runs (Harvey,
  * "Forecasting, structural time series models and the Kalman
  * filter", ch. 2; no counterpart in the reference pipeline, which
  * has no time-series surface at all).
  *
  * Same execution shape as `Ewma.holtForecast`: the per-key series is
  * collected into ONE sorted array column and folded with a STRUCT
  * accumulator `(x, p)` by the higher-order `aggregate` function —
  * codegen-friendly, zero driver involvement, shuffle bounded by the
  * AGGREGATE series grain (one row per key × bucket), never the fact
  * grain. Keys are independent, so a billion keys parallelize
  * trivially; the per-key payload contract is the calendar-bounded
  * bucket series (same as `Ewma.ewmaLast`).
  */
object Kalman {

  /** Local-level (random-walk-plus-noise) Kalman filter per key:
    * state xₜ = xₜ₋₁ + wₜ (Var w = `qVar`), observation zₜ = xₜ + vₜ
    * (Var v = `rVar`). Seed convention (part of the replay contract):
    * x₁ = z₁, P₁ = `rVar`. Then for each subsequent observation in
    * `orderCol` order:
    *
    *   Pₚ = P + qVar;  K = Pₚ/(Pₚ + rVar);
    *   x ← x + K·(z − x);  P ← (1 − K)·Pₚ.
    *
    * Pure +/×/÷ on doubles in a fixed order, so a recursive CTE
    * carrying (x, p) replays it bit-exactly — the q163 Holt oracle
    * discipline. Null observations are dropped before the fold
    * (complete-case, stated); keys whose series is entirely null
    * disappear with them. Ties in `orderCol` are broken by the value
    * (array_sort on the (t, x) struct), so the fold order is total.
    *
    * Output per key: n (observations folded), `level` = final
    * filtered x, `level_var` = final posterior P, `gain` = the K of
    * the LAST update (≈ steady-state for long series; null for n = 1
    * where no update ran), `forecast_next` = level (the local-level
    * one-step point forecast), `forecast_var` = P + qVar + rVar (the
    * one-step predictive variance). All 6-dp rounded. */
  def localLevel(series: DataFrame, key: String, orderCol: String,
                 value: String, qVar: Double, rVar: Double): DataFrame = {
    require(qVar >= 0, s"process variance must be >= 0, got $qVar")
    require(rVar > 0, s"observation variance must be > 0, got $rVar")
    val q = lit(qVar)
    val r = lit(rVar)
    val arr = array_sort(collect_list(struct(col(orderCol).as("t"),
      col(value).cast("double").as("x"))))
    series.filter(col(value).isNotNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n"), arr.as("__arr"))
      .withColumn("__fin",
        aggregate(
          slice(col("__arr"), lit(2), size(col("__arr")) - 1),
          struct(
            element_at(col("__arr"), 1).getField("x").as("x"),
            r.as("p"),
            lit(null).cast("double").as("k")),
          (acc, e) => {
            val pp = acc.getField("p") + q
            val k = pp / (pp + r)
            struct(
              (acc.getField("x") +
                k * (e.getField("x") - acc.getField("x"))).as("x"),
              ((lit(1.0) - k) * pp).as("p"),
              k.as("k"))
          }))
      .select(col(key), col("n"),
        round(col("__fin").getField("x"), 6).as("level"),
        round(col("__fin").getField("p"), 6).as("level_var"),
        round(col("__fin").getField("k"), 6).as("gain"),
        round(col("__fin").getField("x"), 6).as("forecast_next"),
        round(col("__fin").getField("p") + q + r, 6).as("forecast_var"))
  }
}
