package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-parametric monotone-trend statistics over per-key ordered series:
  * the Mann–Kendall S statistic and the Theil–Sen (median-of-pairwise-
  * slopes) trend estimator — the robust companions to [[graft.de
  * .RankStats.groupedOls]]'s least-squares line (a single outlier moves
  * OLS arbitrarily; Theil–Sen tolerates ~29% contamination).
  *
  * Both statistics are inherently pairwise (O(d²) in the series length
  * d), so the contract is the same as [[RankStats.autocorr]] and the
  * changepoint scan: they run over a per-key AGGREGATE series whose
  * length is calendar-bounded (daily/hourly buckets), never over raw
  * facts. At 100 TB the fact table collapses to keys×buckets rows
  * before the self-join; the pair fan-out is d(d−1)/2 per key — 435
  * pairs for a 30-day daily series — and the bucket grain is the knob.
  *
  * Exactness: with integer-valued series (counts) the sign sum is exact
  * by construction, and every pairwise slope is the same double in any
  * engine (one division of exact integers); the Theil–Sen median
  * averages the two middle slopes on even pair counts (the
  * interpolating convention both Spark's `median` and DuckDB's
  * `quantile_cont(0.5)` implement).
  */
object TrendStats {

  /** Per-key Mann–Kendall S and Theil–Sen slope of `value` over the
    * numeric `orderCol` (unique per key): (key, n_points, n_pairs,
    * mk_s BIGINT, theil_sen 6-dp). S > 0 = increasing trend; |S| close
    * to n_pairs = near-monotone. Keys with a single point drop out (no
    * pairs). */
  def trend(series: DataFrame, key: String, orderCol: String,
            value: String): DataFrame = {
    val base = series.select(col(key).as("__k"),
      col(orderCol).cast("double").as("__t"),
      col(value).cast("double").as("__x"))
    val lhs = base.select(col("__k"), col("__t").as("__t1"),
      col("__x").as("__x1"))
    val rhs = base.select(col("__k"), col("__t").as("__t2"),
      col("__x").as("__x2"))
    val pairs = lhs.join(rhs, Seq("__k"))
      .filter(col("__t1") < col("__t2"))
      .select(col("__k"),
        signum(col("__x2") - col("__x1")).as("__sg"),
        ((col("__x2") - col("__x1")) / (col("__t2") - col("__t1")))
          .as("__sl"))
    val nPts = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_points"))
    pairs.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__sg")).cast("long").as("mk_s"),
        round(median(col("__sl")), 6).as("theil_sen"))
      .join(nPts, Seq("__k"))
      .select(col("__k").as(key), col("n_points"), col("n_pairs"),
        col("mk_s"), col("theil_sen"))
  }

  /** Ljung–Box portmanteau test at h = 2 per key: are the first two
    * autocorrelations jointly zero (is the series white noise)?
    * Q = n(n+2)·[r₁²/(n−1) + r₂²/(n−2)] over the standard biased ACF;
    * χ²₂ under H0, so the p-value is exactly exp(−Q/2) — the
    * residual-whiteness gate to run after q146/q163/q173 fits
    * (h fixed at 2 keeps the χ² tail closed-form; larger h needs an
    * incomplete gamma this engine deliberately avoids). One window
    * sort per key for the two lags + one aggregate. Output: (key,
    * n BIGINT, r1 4dp, r2 4dp, q 4dp, p_value 6dp); keys with n ≤ 2
    * or zero variance yield nulls. */
  def ljungBox2(series: DataFrame, key: String, orderCol: String,
                value: String): DataFrame = {
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(orderCol))
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
    val v = col(value).cast("double")
    val lagged = series
      .withColumn("__m", avg(v).over(wKey))
      .withColumn("__d", v - col("__m"))
      .withColumn("__d1", lag(col("__d"), 1).over(wOrd))
      .withColumn("__d2", lag(col("__d"), 2).over(wOrd))
    val a = lagged.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(col("__d") * col("__d")).as("__s0"),
        sum(col("__d") * col("__d1")).as("__s1"),
        sum(col("__d") * col("__d2")).as("__s2"))
    val n = col("n").cast("double")
    val s0 = nullif(when(col("n") > 2, col("__s0")), lit(0.0))
    val r1 = col("__s1") / s0
    val r2 = col("__s2") / s0
    val q = n * (n + 2) * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2))
    a.select(col(key), col("n"),
      round(r1, 4).as("r1"), round(r2, 4).as("r2"),
      round(q, 4).as("q"),
      round(exp(-q / 2), 6).as("p_value"))
  }

  /** Mann–Kendall trend TEST per key — [[trend]]'s S statistic
    * upgraded to a significance readout: tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 over the
    * per-value tie runs, continuity-corrected
    * z = (S ∓ 1)/√Var(S) (0 when S = 0), and the two-sided normal
    * p-value via the codegen'd normal_sf kernel. The nonparametric
    * "is there a monotone trend" answer that needs no distributional
    * assumption on the series. Pairwise at SERIES grain (the
    * theilSen/q323 contract — pre-aggregate to days first).
    * Output: (key, n BIGINT, s BIGINT, var_s 4dp, z 4dp,
    * p_value 6dp); keys with < 2 points drop out. */
  def mannKendallTest(series: DataFrame, key: String, orderCol: String,
                      value: String): DataFrame = {
    import graft.functions.gfunctions.normal_sf
    val base = series.select(col(key).as("__k"),
      col(orderCol).cast("double").as("__t"),
      col(value).cast("double").as("__x"))
    val lhs = base.select(col("__k"), col("__t").as("__t1"),
      col("__x").as("__x1"))
    val rhs = base.select(col("__k"), col("__t").as("__t2"),
      col("__x").as("__x2"))
    val s = lhs.join(rhs, Seq("__k"))
      .filter(col("__t1") < col("__t2"))
      .groupBy(col("__k"))
      .agg(sum(signum(col("__x2") - col("__x1"))).cast("long")
        .as("s"))
    val ties = base.groupBy(col("__k"), col("__x"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("__k"))
      .agg(sum(col("__c")).as("n"),
        sum(col("__c") * (col("__c") - 1) * (col("__c") * 2 + 5))
          .as("__tt"))
    val n = col("n").cast("double")
    val varS = (n * (n - 1) * (n * 2 + 5) - col("__tt")) / 18.0
    val sD = col("s").cast("double")
    val z = when(col("s") > 0, (sD - 1) / sqrt(varS))
      .when(col("s") < 0, (sD + 1) / sqrt(varS))
      .otherwise(lit(0.0))
    ties.join(s, Seq("__k"))
      .filter(col("n") >= 2)
      .select(col("__k").as(key), col("n"), col("s"),
        round(varS, 4).as("var_s"),
        round(z, 4).as("z"),
        round(lit(2.0) * normal_sf(abs(z)), 6).as("p_value"))
  }

  /** Partial autocorrelation at lags 1–3 per key, via the
    * Durbin–Levinson closed forms over the standard biased ACF
    * r_k = Σ_{t>k}(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)²:
    * φ₁₁ = r₁; φ₂₂ = (r₂−r₁²)/(1−r₁²);
    * φ₃₃ = (r₃ − φ₂₁r₂ − φ₂₂r₁)/(1 − φ₂₁r₁ − φ₂₂r₂),
    * φ₂₁ = r₁(1−r₂)/(1−r₁²) — the AR-order diagnostic next to
    * [[graft.ml.RankStats.autocorr]]'s plain ACF (PACF cutting off at
    * lag p is the AR(p) signature; ACF alone can't tell AR from MA).
    * One (key, order) window sort for the three lags + one aggregate;
    * everything else is closed-form column math on the aggregate row.
    * Output: (key, n BIGINT, r1, r2, r3, pacf1, pacf2, pacf3 — 4dp,
    * nulls where a denominator degenerates). */
  def pacf3(series: DataFrame, key: String, orderCol: String,
            value: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__t"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k"))
    val base = series.select(col(key).as("__k"),
        col(orderCol).as("__t"), col(value).cast("double").as("__x"))
      .withColumn("__m", avg(col("__x")).over(wAll))
      .withColumn("__d", col("__x") - col("__m"))
      .withColumn("__d1", lag(col("__d"), 1).over(w))
      .withColumn("__d2", lag(col("__d"), 2).over(w))
      .withColumn("__d3", lag(col("__d"), 3).over(w))
    val agg = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("n"),
        sum(col("__d") * col("__d")).as("__g0"),
        sum(col("__d") * col("__d1")).as("__g1"),
        sum(col("__d") * col("__d2")).as("__g2"),
        sum(col("__d") * col("__d3")).as("__g3"))
    val r1 = col("__g1") / nullif(col("__g0"), lit(0.0))
    val r2 = col("__g2") / nullif(col("__g0"), lit(0.0))
    val r3 = col("__g3") / nullif(col("__g0"), lit(0.0))
    val p22 = (r2 - r1 * r1) / nullif(lit(1.0) - r1 * r1, lit(0.0))
    val p21 = r1 * (lit(1.0) - r2) / nullif(lit(1.0) - r1 * r1, lit(0.0))
    val p33 = (r3 - p21 * r2 - p22 * r1) /
      nullif(lit(1.0) - p21 * r1 - p22 * r2, lit(0.0))
    agg.select(col("__k").as(key), col("n"),
      round(r1, 4).as("r1"), round(r2, 4).as("r2"),
      round(r3, 4).as("r3"),
      round(r1, 4).as("pacf1"), round(p22, 4).as("pacf2"),
      round(p33, 4).as("pacf3"))
  }
}
