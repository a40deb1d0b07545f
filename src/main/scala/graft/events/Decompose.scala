package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition (X80): x = trend +
  * seasonal + residual over per-key bucketed series with an ODD period
  * m — the moving-average decomposition every monitoring dashboard
  * draws, and the model-free companion to [[Ewma.holtWinters]]'s
  * recursive state.
  *
  * trend_t = centered m-term moving average (exact integer-sum / m,
  * complete windows only — the m/2 edge buckets get null trend and drop
  * from the seasonal fit); seasonal_p = mean of detrended values at
  * phase p = t mod m, re-centered so the m seasonal terms sum to zero;
  * residual = x − trend − seasonal. The seasonal means average
  * engine-deterministic doubles in engine-ARBITRARY order, so seasonal
  * is rounded to 6 dp BEFORE the residual subtraction on both engines —
  * the rounding is part of the operator contract, not cosmetics.
  *
  * Scale shape: per-key window over the calendar-bounded bucket series
  * (one sort), a (key, phase) hash aggregate, a broadcast re-centering
  * 1-row-per-key aggregate, and a co-partitioned join back — facts
  * must be pre-bucketed by the caller, the [[Ewma]] contract.
  */
object Decompose {

  /** Output: (key, idx BIGINT — 0-based position in the series, x,
    * trend 6-dp nullable, seasonal 6-dp, residual 6-dp nullable). */
  def classical(series: DataFrame, key: String, orderCol: String,
                value: String, m: Int): DataFrame = {
    require(m >= 3 && m % 2 == 1, s"period must be odd and >= 3, got $m")
    val half = m / 2
    val wOrd = Window.partitionBy(col(key)).orderBy(col(orderCol))
    val wMa = wOrd.rowsBetween(-half, half)
    val base = series
      .withColumn("__idx", (row_number().over(wOrd) - 1).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(key))))
      .withColumn("trend",
        when(col("__idx") >= half && col("__idx") < col("__n") - half,
          sum(col(value)).over(wMa).cast("double") / m))
      .withColumn("__phase", col("__idx") % m)
    val seas = base.filter(col("trend").isNotNull)
      .groupBy(col(key), col("__phase"))
      .agg(avg(col(value) - col("trend")).as("__sraw"))
    val centers = seas.groupBy(col(key))
      .agg(avg(col("__sraw")).as("__c"))
    val seasonal = seas.join(broadcast(centers), Seq(key))
      .select(col(key), col("__phase"),
        round(col("__sraw") - col("__c"), 6).as("seasonal"))
    base.join(seasonal, Seq(key, "__phase"), "left")
      .select(col(key), col("__idx").as("idx"),
        col(value).cast("double").as("x"),
        round(col("trend"), 6).as("trend"),
        col("seasonal"),
        round(col(value) - col("trend") - col("seasonal"), 6)
          .as("residual"))
  }

  /** Seasonal/trend STRENGTH per key (Hyndman & Athanasopoulos,
    * fpp3 §4.4): over [[classical]]'s complete-window rows,
    * F_seasonal = max(0, 1 − Var(R)/Var(S + R)) and
    * F_trend = max(0, 1 − Var(R)/Var(T + R)) — the scale-free 0..1
    * answer to "is this series worth a seasonal model", directly
    * comparable across thousands of series where raw variances are
    * not. Same machinery and scale contract as [[classical]] plus one
    * closing aggregate. Output: (key, n_used BIGINT, f_seasonal 4dp,
    * f_trend 4dp); degenerate variances yield nulls. */
  def strength(series: DataFrame, key: String, orderCol: String,
               value: String, m: Int): DataFrame = {
    val dec = classical(series, key, orderCol, value, m)
      .filter(col("residual").isNotNull)
    dec.groupBy(col(key))
      .agg(count(lit(1)).as("n_used"),
        var_pop(col("residual")).as("__vr"),
        var_pop(col("seasonal") + col("residual")).as("__vsr"),
        var_pop(col("trend") + col("residual")).as("__vtr"))
      .select(col(key), col("n_used"),
        round(greatest(lit(0.0),
          lit(1.0) - col("__vr") / nullif(col("__vsr"), lit(0.0))), 4)
          .as("f_seasonal"),
        round(greatest(lit(0.0),
          lit(1.0) - col("__vr") / nullif(col("__vtr"), lit(0.0))), 4)
          .as("f_trend"))
  }

  /** Ratio-to-moving-average seasonal INDEX — the multiplicative
    * sibling of [[classical]]: per phase p, the mean of x/trend over
    * complete-window buckets, renormalized so the m indexes average
    * exactly 1 ("Mondays run at 0.82× the weekly trend"). The form
    * forecasting courses call the classical multiplicative
    * decomposition's seasonal step; right where amplitude scales with
    * level (sales, traffic), where the additive seasonal misfits both
    * ends. Same machinery and scale contract as [[classical]]; zero
    * trend buckets drop from the fit (ratio undefined). Output:
    * (key, phase BIGINT, n_obs BIGINT, seasonal_index 6dp). */
  def multiplicativeIndex(series: DataFrame, key: String,
                          orderCol: String, value: String,
                          m: Int): DataFrame = {
    require(m >= 3 && m % 2 == 1, s"period must be odd and >= 3, got $m")
    val half = m / 2
    val wOrd = Window.partitionBy(col(key)).orderBy(col(orderCol))
    val wMa = wOrd.rowsBetween(-half, half)
    val base = series
      .withColumn("__idx", (row_number().over(wOrd) - 1).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(key))))
      .withColumn("__trend",
        when(col("__idx") >= half && col("__idx") < col("__n") - half,
          sum(col(value)).over(wMa).cast("double") / m))
      .withColumn("__phase", col("__idx") % m)
    val ratios = base.filter(col("__trend").isNotNull &&
        col("__trend") =!= 0.0)
      .groupBy(col(key), col("__phase"))
      .agg(count(lit(1)).as("n_obs"),
        avg(col(value) / col("__trend")).as("__r"))
    val centers = ratios.groupBy(col(key))
      .agg(avg(col("__r")).as("__c"))
    ratios.join(broadcast(centers), Seq(key))
      .select(col(key), col("__phase").as("phase"), col("n_obs"),
        round(col("__r") / nullif(col("__c"), lit(0.0)), 6)
          .as("seasonal_index"))
  }
}
