package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Financial time-series kernels over pre-bucketed series: max
  * drawdown, Bollinger bands, and OHLC/VWAP bar assembly. All three
  * are single-shuffle shapes — one hash partition by series key (or
  * (key, bar)), windows and aggregates ride the same partitioning, and
  * output is bucket- or key-bounded. Equity/flow series are expected
  * in exact integer units (cents) when cross-engine determinism
  * matters — the catalog entries feed `round(sum(x)*100)::long`.
  */
object Finance {

  /** Per-key maximum drawdown of the cumulative-sum equity curve of
    * `value` ordered by `bucket`: equity_t = Σ flow, peak_t = running
    * max, drawdown_t = peak_t − equity_t. Output per key:
    * (key, n_buckets, final_equity, peak_equity, max_drawdown,
    * trough = earliest bucket attaining the max drawdown). With an
    * integer flow column every statistic is exact. One shuffle; the
    * drawdown-argmax sort reuses the key partitioning.
    */
  def maxDrawdown(df: DataFrame, key: String, bucket: String,
                  value: String): DataFrame = {
    val wRun = Window.partitionBy(key).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cur = df
      .withColumn("__eq", sum(col(value)).over(wRun))
      .withColumn("__peak", max(col("__eq")).over(wRun))
      .withColumn("__dd", col("__peak") - col("__eq"))
    val byDd = Window.partitionBy(key)
      .orderBy(col("__dd").desc, col(bucket))
    val byLast = Window.partitionBy(key).orderBy(col(bucket).desc)
    cur
      .withColumn("__rn", row_number().over(byDd))
      .withColumn("__rnl", row_number().over(byLast))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_buckets"),
        max(when(col("__rnl") === 1, col("__eq"))).as("final_equity"),
        max(col("__peak")).as("peak_equity"),
        max(when(col("__rn") === 1, col("__dd"))).as("max_drawdown"),
        max(when(col("__rn") === 1, col(bucket))).as("trough"))
  }

  /** Bollinger bands: trailing `width`-bucket sample mean/stddev per
    * key, band = mean ± k·sd, with breakout flags. Incomplete leading
    * windows (fewer than `width` buckets) get null bands and false
    * flags. Adds roll_mean / roll_sd / upper / lower / break_up /
    * break_down / roll_n to the input rows.
    */
  def bollinger(df: DataFrame, key: String, bucket: String,
                value: String, width: Int, k: Double): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(bucket))
      .rowsBetween(-(width - 1), 0)
    val v = col(value)
    val full = count(lit(1)).over(w) === width
    val m = when(full, avg(v).over(w))
    val sd = when(full, stddev_samp(v).over(w))
    df.withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_mean", m)
      .withColumn("roll_sd", sd)
      .withColumn("upper", m + lit(k) * sd)
      .withColumn("lower", m - lit(k) * sd)
      .withColumn("break_up", coalesce(v > m + lit(k) * sd, lit(false)))
      .withColumn("break_down", coalesce(v < m - lit(k) * sd, lit(false)))
  }

  /** OHLC + VWAP bars: per (key, day-of-`ts`) open/high/low/close of
    * `price` (open/close picked by deterministic (ts, tie) order — no
    * max_by tie ambiguity), volume = Σ qty, vwap = Σ price·qty / Σ qty,
    * n_trades. Two row_number windows and the bar aggregate all share
    * one (key, bar_ts) partitioning.
    */
  def ohlcVwap(df: DataFrame, key: String, ts: String, tie: String,
               price: String, qty: String): DataFrame = {
    val withBar = df.withColumn("bar_ts", date_trunc("day", col(ts)))
    val asc = Window.partitionBy(col(key), col("bar_ts"))
      .orderBy(col(ts).asc, col(tie).asc)
    val desc = Window.partitionBy(col(key), col("bar_ts"))
      .orderBy(col(ts).desc, col(tie).desc)
    withBar
      .withColumn("__rna", row_number().over(asc))
      .withColumn("__rnd", row_number().over(desc))
      .groupBy(col(key), col("bar_ts"))
      .agg(
        max(when(col("__rna") === 1, col(price))).as("open"),
        max(col(price)).as("high"),
        min(col(price)).as("low"),
        max(when(col("__rnd") === 1, col(price))).as("close"),
        sum(col(qty)).as("volume"),
        // q94 snap-divide (fuzz-41): the notional sum snaps to exact
        // integer ten-thousandths before the ONE exact division by the
        // integer volume — grid-priced data (real markets tick on a
        // decimal grid) makes the snap lossless and the quotient
        // engine-identical; no final round downstream.
        // Headroom bound (RankStats precedent): round(Σ·1e4) is only
        // lossless while |Σ(price·qty)| per (key, bar) stays < 2^53/1e4
        // ≈ 9e8 value units — beyond that the double can't hold the
        // scaled integer and the by-construction claim breaks. Bars
        // whose notional can exceed that need the DECIMAL accumulation
        // form instead.
        (round(sum(col(price) * col(qty)) * 1e4) /
          (lit(1e4) * sum(col(qty)))).as("vwap"),
        count(lit(1)).as("n_trades"))
  }

  /** Per-key Sharpe and Sortino ratios over the simple returns of a
    * per-bucket value series: r_t = v_t / v_{t−1} − 1 from one lag
    * window, then sharpe = mean(r)/sd(r) and sortino =
    * mean(r)/sd(min(r, 0)) (downside deviation about zero — the
    * convention that treats all positive periods as zero risk). Sample
    * std throughout; keys with < 3 buckets or zero deviation yield
    * null ratios (nullif guards, ANSI-safe). Series are bucket-grain
    * aggregates (the maxDrawdown scale contract). Output: (key,
    * n_returns BIGINT, mean_ret 6dp, sharpe 4dp, sortino 4dp). */
  def sharpeSortino(df: DataFrame, key: String, bucket: String,
                    value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
    val v = col(value).cast("double")
    val r = v / nullif(lag(v, 1).over(w), lit(0.0)) - 1.0
    df.withColumn("__r", r)
      .filter(col("__r").isNotNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_returns"),
        avg(col("__r")).as("__m"),
        stddev_samp(col("__r")).as("__sd"),
        stddev_samp(least(col("__r"), lit(0.0))).as("__dd"))
      .select(col(key), col("n_returns"),
        round(col("__m"), 6).as("mean_ret"),
        round(col("__m") / nullif(col("__sd"), lit(0.0)), 4).as("sharpe"),
        round(col("__m") / nullif(col("__dd"), lit(0.0)), 4).as("sortino"))
  }

  /** Kupiec POF (proportion-of-failures) VaR backtest per key: the
    * first ⌊n/2⌋ buckets (in bucket order) estimate the p-quantile
    * VaR; the rest are tested for violations (value < VaR).
    * LR_POF = −2·ln[(1−p)^{n−x}·p^x / ((1−x/n)^{n−x}·(x/n)^x)] is
    * χ²₁ under a correctly calibrated model; p-value via the normal
    * tail 2·P(Z > √LR). The "does the 5% tail actually fire 5% of
    * the time" audit every quantile forecast needs. Zero/full
    * violation counts take the x·ln(x/n) → 0 limit explicitly.
    * One rank window + two aggregates per key. Output: (key,
    * n_est BIGINT, n_test BIGINT, var_est 4dp, n_violations BIGINT,
    * rate 4dp, lr_pof 4dp, p_value 6dp); keys with an empty half
    * drop out. */
  def varBacktest(df: DataFrame, key: String, bucket: String,
                  value: String, p: Double = 0.05): DataFrame = {
    import graft.functions.gfunctions.normal_sf
    require(p > 0 && p < 1, "p in (0,1)")
    val v = col(value).cast("double")
    val wOrd = Window.partitionBy(col(key)).orderBy(col(bucket))
    val wKey = Window.partitionBy(col(key))
    val split = df
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wKey))
      .withColumn("__est", col("__rn") <= floor(col("__n") / 2))
    val est = split.filter(col("__est"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_est"),
        percentile(v, lit(p)).as("__var"))
    val test = split.filter(!col("__est"))
      .join(broadcast(est), Seq(key))
      .groupBy(col(key))
      .agg(max(col("n_est")).as("n_est"),
        count(lit(1)).as("n_test"),
        max(col("__var")).as("__var"),
        sum(when(v < col("__var"), 1L).otherwise(0L)).as("x"))
    val n = col("n_test").cast("double")
    val x = col("x").cast("double")
    val xln = when(col("x") > 0, x * log(x / n)).otherwise(lit(0.0))
    val nxln = when(col("x") < col("n_test"),
      (n - x) * log(lit(1.0) - x / n)).otherwise(lit(0.0))
    // LR is ≥ 0 analytically; clamp the −1e-16 float dips so √LR
    // never goes NaN when the observed rate sits exactly at p
    val lr = greatest(lit(0.0), lit(-2.0) *
      ((n - x) * math.log(1 - p) + x * math.log(p) - nxln - xln))
    test.filter(col("n_est") > 0 && col("n_test") > 0)
      .select(col(key), col("n_est"), col("n_test"),
        round(col("__var"), 4).as("var_est"),
        col("x").as("n_violations"),
        round(x / n, 4).as("rate"),
        round(lr, 4).as("lr_pof"),
        round(lit(2.0) * normal_sf(sqrt(lr)), 6).as("p_value"))
  }

  /** Historical VaR + expected shortfall (CVaR) per key (X266) — the
    * coherent tail-risk companion to [[varBacktest]]: VaR_p is the
    * exact interpolated p-quantile of the per-bucket return chain
    * (the [[sharpeSortino]] construction), ES_p the mean of returns
    * at-or-below it. ES is what VaR famously isn't: subadditive, and
    * sensitive to HOW BAD the tail is, not just how often it fires.
    *
    * Shape: one lag window for returns (series-bounded per key), one
    * exact-percentile aggregate per key, the VaR frame broadcast back
    * (key-bounded), one tail aggregate. Keys with < 2 buckets drop out
    * (no returns); an empty tail (VaR below every return — impossible
    * for p > 0 with the ≤ rule, but guarded) yields null ES.
    *
    * Output per key: (key, n_returns, var_p 6dp, n_tail BIGINT,
    * es_p 6dp). */
  def expectedShortfall(df: DataFrame, key: String, bucket: String,
                        value: String,
                        p: Double = 0.05): DataFrame = {
    require(p > 0 && p < 1, "p in (0,1)")
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
    val v = col(value).cast("double")
    val rets = df
      .withColumn("__r", v / nullif(lag(v, 1).over(w), lit(0.0)) - 1.0)
      .filter(col("__r").isNotNull)
    val vars = rets.groupBy(col(key))
      .agg(count(lit(1)).as("n_returns"),
        percentile(col("__r"), lit(p)).as("__var"))
    rets.join(broadcast(vars), Seq(key))
      .groupBy(col(key))
      .agg(max(col("n_returns")).as("n_returns"),
        max(col("__var")).as("__v"),
        sum(when(col("__r") <= col("__var"), 1L).otherwise(0L))
          .as("n_tail"),
        avg(when(col("__r") <= col("__var"), col("__r"))).as("__es"))
      .select(col(key), col("n_returns"),
        round(col("__v"), 6).as("var_p"), col("n_tail"),
        round(col("__es"), 6).as("es_p"))
  }
}
