package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extreme-value tail profiling: peaks-over-threshold with a
  * generalized Pareto fit by method of moments — "how heavy is this
  * tail, really", beyond what any central-moment summary can say.
  * The Pickands–Balkema–de Haan theorem says threshold exceedances
  * are asymptotically GPD regardless of the body; MoM over the
  * exceedances (ξ = ½(1 − m²/v), σ = ½m(1 + m²/v)) is the
  * closed-form, deterministic estimator (MLE is iterative — the
  * engine's exactness contract picks MoM and says so). ξ > 0 is the
  * heavy-tail verdict; mean excess rising with the threshold is the
  * classic confirmation.
  *
  * One exact-percentile aggregate for the threshold, one filtered
  * aggregate over the exceedances — trimmedMean's shape.
  */
object Evt {

  /** Output per group: (group, n BIGINT, threshold 4dp at quantile q,
    * n_exceed BIGINT, mean_excess 4dp, xi 4dp, sigma 4dp); groups
    * with < 2 exceedances or zero excess variance yield null fits.
    * MoM caveat (documented): valid for ξ < ½ — heavier tails than
    * that have infinite variance and need an MLE/Hill follow-up. */
  def gpdTail(df: DataFrame, groupCol: String, valueCol: String,
              q: Double = 0.95): DataFrame = {
    require(q > 0 && q < 1, "q in (0,1)")
    val v = col(valueCol).cast("double")
    val nn = df.filter(v.isNotNull)
    val thr = nn.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), percentile(v, lit(q)).as("__u"))
    // Aggregate the exceedances alone, then left-join back onto the
    // per-group threshold frame: a group whose exceedance set is empty
    // (heavy ties AT the q-quantile make `v > __u` drop everything)
    // must still emit its row with n_exceed = 0 and null fits — the
    // documented row-per-group contract.
    val exAgg = nn.join(broadcast(thr), Seq(groupCol))
      .filter(v > col("__u"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_exceed"),
        avg(v - col("__u")).as("__me"),
        var_pop(v - col("__u")).as("__ve"))
    val ex = thr.join(exAgg, Seq(groupCol), "left")
      .withColumn("n_exceed", coalesce(col("n_exceed"), lit(0L)))
    val ratio = col("__me") * col("__me") /
      nullif(when(col("n_exceed") >= 2, col("__ve")), lit(0.0))
    ex.select(col(groupCol), col("n"),
      round(col("__u"), 4).as("threshold"),
      col("n_exceed"),
      round(col("__me"), 4).as("mean_excess"),
      round(lit(0.5) * (lit(1.0) - ratio), 4).as("xi"),
      round(lit(0.5) * col("__me") * (lit(1.0) + ratio), 4)
        .as("sigma"))
  }
}
