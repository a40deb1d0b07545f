package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Higher-moment shape statistics and internal-consistency reliability.
  * Everything reduces to map-side-combinable power sums — no
  * engine-specific skewness/kurtosis builtins (Spark's are population
  * m3/m2^1.5 while DuckDB's are bias-corrected sample forms; computing
  * from Σx…Σx⁴ explicitly makes the definition, and the cross-engine
  * oracle, unambiguous).
  */
object Moments {

  /** Population skewness and excess kurtosis per group from one pass
    * of power sums: m_k = central moments via the binomial expansion.
    * Output: (group, n, mean 4dp, sd 4dp population, skewness 4dp,
    * kurtosis 4dp excess). Degenerate groups (n < 2 or zero variance)
    * yield null shape statistics.
    */
  def groupedMoments(df: DataFrame, group: String,
                     value: String): DataFrame = {
    val v = col(value).cast("double")
    val a = df.filter(v.isNotNull)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
    val n = col("n").cast("double")
    val m = col("s1") / n
    val m2 = col("s2") / n - m * m
    val m3 = col("s3") / n - lit(3.0) * m * col("s2") / n +
      lit(2.0) * m * m * m
    val m4 = col("s4") / n - lit(4.0) * m * col("s3") / n +
      lit(6.0) * m * m * col("s2") / n - lit(3.0) * m * m * m * m
    val m2ok = nullif(when(col("n") >= 2, m2), lit(0.0))
    // m2^1.5 as sqrt(m2)*m2 — multiply+sqrt are IEEE-exact on both
    // engines, unlike libm pow whose last ulp may differ.
    a.select(col(group), col("n"),
      round(m, 4).as("mean"),
      round(sqrt(m2), 4).as("sd"),
      round(m3 / (sqrt(m2ok) * m2ok), 4).as("skewness"),
      round(m4 / (m2ok * m2ok) - lit(3.0), 4).as("kurtosis"))
  }

  /** Jarque–Bera normality test per group: JB = n/6·(S² + K²/4) from
    * the same one-pass power sums as [[groupedMoments]] (S population
    * skewness, K excess kurtosis). JB is asymptotically χ²₂ under
    * normality, and the χ² survival function at 2 degrees of freedom
    * is EXACTLY exp(−x/2) — no numeric integration, so the p-value is
    * engine-exact. Output: (group, n BIGINT, skewness 4dp,
    * kurtosis 4dp, jb 4dp, p_value 6dp); groups with n < 2 or zero
    * variance yield null statistics. */
  def jarqueBera(df: DataFrame, group: String,
                 value: String): DataFrame = {
    val v = col(value).cast("double")
    val a = df.filter(v.isNotNull)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
    val n = col("n").cast("double")
    val m = col("s1") / n
    val m2 = col("s2") / n - m * m
    val m3 = col("s3") / n - lit(3.0) * m * col("s2") / n +
      lit(2.0) * m * m * m
    val m4 = col("s4") / n - lit(4.0) * m * col("s3") / n +
      lit(6.0) * m * m * col("s2") / n - lit(3.0) * m * m * m * m
    val m2ok = nullif(when(col("n") >= 2, m2), lit(0.0))
    val s = m3 / (sqrt(m2ok) * m2ok)
    val k = m4 / (m2ok * m2ok) - lit(3.0)
    val jb = n / 6.0 * (s * s + k * k / 4.0)
    a.select(col(group), col("n"),
      round(s, 4).as("skewness"),
      round(k, 4).as("kurtosis"),
      round(jb, 4).as("jb"),
      round(exp(-jb / 2.0), 6).as("p_value"))
  }

  /** D'Agostino K² omnibus normality test — the finite-n-calibrated
    * upgrade of [[jarqueBera]]: the sample skewness and kurtosis are
    * each transformed to approximate standard normals (D'Agostino
    * 1970 for Z_s, Anscombe–Glynn 1983 for Z_k — both CLOSED FORM,
    * no table lookup), K² = Z_s² + Z_k² is χ²₂, so the p-value is
    * exactly exp(−K²/2). scipy.stats.normaltest parity. One power-sum
    * pass; the cube root of a possibly negative Anscombe term goes
    * through cbrt (sign-preserving on both engines, unlike pow).
    * Output: (group, n BIGINT, z_skew 4dp, z_kurt 4dp, k2 4dp,
    * p_value 6dp); groups with n < 20 drop out (the transformations'
    * stated validity floor). */
  def dagostinoK2(df: DataFrame, group: String,
                  value: String): DataFrame = {
    val v = col(value).cast("double")
    val a = df.filter(v.isNotNull)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
      .filter(col("n") >= 20)
    val n = col("n").cast("double")
    val m = col("s1") / n
    val m2 = col("s2") / n - m * m
    val m3 = col("s3") / n - lit(3.0) * m * col("s2") / n +
      lit(2.0) * m * m * m
    val m4 = col("s4") / n - lit(4.0) * m * col("s3") / n +
      lit(6.0) * m * m * col("s2") / n - lit(3.0) * m * m * m * m
    val m2ok = nullif(m2, lit(0.0))
    val b1 = m3 / (sqrt(m2ok) * m2ok)        // population skewness
    val b2 = m4 / (m2ok * m2ok)              // population kurtosis
    // D'Agostino skewness transform
    val y = b1 * sqrt((n + 1) * (n + 3) / (lit(6.0) * (n - 2)))
    val beta2 = lit(3.0) * (n * n + lit(27.0) * n - 70) * (n + 1) *
      (n + 3) / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    val w2 = sqrt(lit(2.0) * (beta2 - 1)) - 1
    val delta = lit(1.0) / sqrt(log(sqrt(w2)))
    val alpha = sqrt(lit(2.0) / (w2 - 1))
    val zs = delta * log(y / alpha + sqrt(y / alpha * (y / alpha) + 1))
    // Anscombe–Glynn kurtosis transform
    val eb2 = lit(3.0) * (n - 1) / (n + 1)
    val vb2 = lit(24.0) * n * (n - 2) * (n - 3) /
      ((n + 1) * (n + 1) * (n + 3) * (n + 5))
    val x = (b2 - eb2) / sqrt(vb2)
    val sqB1 = lit(6.0) * (n * n - lit(5.0) * n + 2) /
      ((n + 7) * (n + 9)) *
      sqrt(lit(6.0) * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    val aa = lit(6.0) + lit(8.0) / sqB1 *
      (lit(2.0) / sqB1 + sqrt(lit(1.0) + lit(4.0) / (sqB1 * sqB1)))
    val zk = (lit(1.0) - lit(2.0) / (lit(9.0) * aa) -
      cbrt((lit(1.0) - lit(2.0) / aa) /
        (lit(1.0) + x * sqrt(lit(2.0) / (aa - 4))))) *
      sqrt(lit(9.0) * aa / 2)
    val k2 = zs * zs + zk * zk
    a.select(col(group), col("n"),
      round(zs, 4).as("z_skew"),
      round(zk, 4).as("z_kurt"),
      round(k2, 4).as("k2"),
      round(exp(-k2 / 2), 6).as("p_value"))
  }

  /** Cronbach's alpha: internal consistency of k items over subjects.
    * Long input (subject, item, score contribution); per-(subject,
    * item) scores are summed and missing cells zero-filled via a
    * broadcast item-grid join (items are k-bounded; the grid is k·n —
    * linear in subjects, never quadratic). alpha = k/(k−1) ·
    * (1 − Σ item var / total var), sample variances over subjects.
    * Output (one row): k, n_subjects, sum_item_var 4dp, total_var 4dp,
    * alpha 4dp.
    */
  def cronbachAlpha(df: DataFrame, subject: String, item: String,
                    value: String): DataFrame = {
    val cell = df.groupBy(col(subject).as("__s"), col(item).as("__i"))
      .agg(sum(col(value).cast("double")).as("__v"))
    val items = cell.select(col("__i")).distinct()
    val subjects = cell.select(col("__s")).distinct()
    val grid = subjects.crossJoin(broadcast(items))
    val full = grid.join(cell, Seq("__s", "__i"), "left")
      .select(col("__s"), col("__i"), coalesce(col("__v"), lit(0.0)).as("__v"))
    val itemVar = full.groupBy(col("__i"))
      .agg(var_samp(col("__v")).as("__iv"))
      .agg(count(lit(1)).as("k"), sum(col("__iv")).as("__siv"))
    val totalVar = full.groupBy(col("__s"))
      .agg(sum(col("__v")).as("__tot"))
      .agg(count(lit(1)).as("n_subjects"), var_samp(col("__tot")).as("__tv"))
    val kd = col("k").cast("double")
    itemVar.crossJoin(totalVar)
      .select(col("k"), col("n_subjects"),
        round(col("__siv"), 4).as("sum_item_var"),
        round(col("__tv"), 4).as("total_var"),
        when(col("k") >= 2,
          round(kd / (kd - 1) *
            (lit(1.0) - col("__siv") / nullif(col("__tv"), lit(0.0))), 4))
          .as("alpha"))
  }
}
