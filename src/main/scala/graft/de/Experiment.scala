package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experimentation readouts (X65): CUPED variance reduction.
  *
  * CUPED (Deng et al. 2013, "Improving the Sensitivity of Online
  * Controlled Experiments by Utilizing Pre-Experiment Data") adjusts
  * each unit's post-period metric with its pre-period covariate:
  * ŷ = y − θ(x − mean(x)), θ = cov(x, y)/var(x) pooled across variants.
  * Identical variant means shift but their DIFFERENCE is unbiased, and
  * variance shrinks by the squared pre/post correlation — the standard
  * way to cut A/B-test runtimes without touching the assignment.
  */
object Experiment {

  /** Per-variant CUPED readout over a one-row-per-unit frame:
    * (variant, n, raw_mean, adj_mean, raw_var, adj_var, var_reduction),
    * metrics 4-dp.
    *
    * Shape: one global 1-row aggregate (mean/cov/var) broadcast back
    * onto the unit frame as a crossJoin — the A14 pattern, no
    * single-partition window — then one per-variant hash aggregate.
    * Two passes over units, both map-side-partial; at 100 TB the unit
    * frame is customers, not events, and both passes are narrow.
    * Zero pre-period variance (θ undefined) degrades to θ = 0, i.e. the
    * unadjusted readout, which is CUPED's honest no-covariate limit. */
  def cupedReadout(units: DataFrame, variant: String, pre: String,
                   post: String): DataFrame = {
    val x = col(pre).cast("double")
    val y = col(post).cast("double")
    val stats = units.agg(
      avg(x).as("__mx"),
      covar_samp(x, y).as("__cxy"),
      var_samp(x).as("__vx"))
    val adj = units.crossJoin(broadcast(stats))
      .withColumn("__theta",
        when(col("__vx") > 0, col("__cxy") / col("__vx"))
          .otherwise(lit(0.0)))
      .withColumn("__adj", y - col("__theta") * (x - col("__mx")))
    adj.groupBy(col(variant))
      .agg(count(lit(1)).as("n"),
        round(avg(y), 4).as("raw_mean"),
        round(avg(col("__adj")), 4).as("adj_mean"),
        round(var_samp(y), 4).as("raw_var"),
        round(var_samp(col("__adj")), 4).as("adj_var"),
        round(lit(1.0) - var_samp(col("__adj")) / nullif(var_samp(y),
          lit(0.0)), 4).as("var_reduction"))
      .orderBy(col(variant))
  }
}
