package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-effect (inverse-variance) meta-analysis pooling: combine
  * per-stratum effect estimates (θ_i, se_i) into one pooled estimate
  * with heterogeneity diagnostics — the standard readout when the same
  * contrast is measured across many strata/sites/cohorts (Borenstein
  * et al., Introduction to Meta-Analysis, ch. 11).
  *
  * Weights w_i = 1/se_i²; pooled = Σwθ/Σw; se = √(1/Σw);
  * Cochran's Q = Σw(θ − pooled)² (expanded to Σwθ² − (Σwθ)²/Σw so one
  * aggregate suffices); I² = max(0, (Q − df)/Q). One
  * map-side-combinable aggregate over stratum rows.
  */
object Meta {

  /** Input: one row per stratum with unrounded `effect` and `se`
    * columns (se > 0; rows violating that are dropped). Output (one
    * row): k, pooled 4dp, pooled_se 4dp, z 4dp, q_stat 4dp, i2 4dp
    * (null i2 when Q = 0 or k < 2).
    */
  def fixedEffect(df: DataFrame, effect: String, se: String): DataFrame = {
    val e = col(effect).cast("double")
    val s = col(se).cast("double")
    val w = lit(1.0) / (s * s)
    val agg = df
      .filter(e.isNotNull && s.isNotNull && s > 0)
      .agg(count(lit(1)).as("k"),
        sum(w).as("__sw"), sum(w * e).as("__swe"),
        sum(w * e * e).as("__swee"))
    val pooled = col("__swe") / col("__sw")
    val pse = sqrt(lit(1.0) / col("__sw"))
    val q = col("__swee") - col("__swe") * col("__swe") / col("__sw")
    val dfree = (col("k") - 1).cast("double")
    agg.select(col("k"),
      round(pooled, 4).as("pooled"),
      round(pse, 4).as("pooled_se"),
      round(pooled / pse, 4).as("z"),
      round(q, 4).as("q_stat"),
      when(col("k") >= 2 && q > 0,
        round(greatest((q - dfree) / q, lit(0.0)), 4)).as("i2"))
  }
}
