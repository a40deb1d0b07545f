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

  /** Gumbel fit of per-group BLOCK MAXIMA by L-moments (X311,
    * [[gpdTail]]'s complement: annual-maxima EVT vs
    * peaks-over-threshold — the Fisher–Tippett route, where the max
    * of each block is asymptotically GEV and the light-tailed ξ = 0
    * member is Gumbel). The estimator is Hosking's L-moment method,
    * chosen over MLE for the engine's exactness contract: probability-
    * weighted moments are LINEAR in the order statistics,
    *
    *   b₀ = Σ x₍ᵣ₎ / n,
    *   b₁ = Σ (r−1)·x₍ᵣ₎ / (n(n−1)),
    *   b₂ = Σ (r−1)(r−2)·x₍ᵣ₎ / (n(n−1)(n−2)),
    *
    * so the whole fit is one rank window + one aggregate — closed
    * form, no iteration, replayable in SQL. Ranks are row_number over
    * the block-maxima sort; tied maxima get arbitrary rank order but
    * the weighted sums are INVARIANT under it (equal x across the
    * tied block — the Kruskal–Wallis argument), so both engines
    * agree. Then l₁ = b₀, l₂ = 2b₁ − b₀, and Gumbel
    * scale β = l₂/ln 2, location μ = l₁ − γβ (γ = Euler–Mascheroni,
    * the same 16-digit literal on both sides). The T-year return
    * level is μ − β·ln(−ln(1 − 1/T)).
    *
    * l_skew (τ₃ = (6b₂ − 6b₁ + b₀)/l₂) is the shape readout: Gumbel's
    * theoretical τ₃ is 2·ln3/ln2 − 3 ≈ 0.1699, and `l_skew_gap`
    * (observed − theoretical) is the "should I fit full GEV instead"
    * screen — strongly positive means a heavy-tailed (Fréchet) block
    * distribution, negative a bounded (Weibull) one.
    *
    * Scale shape: facts collapse to block grain in ONE aggregate
    * first; the rank window partitions by group over the
    * calendar-bounded block series (the X69 at-risk-table contract).
    * Groups with < 3 blocks or zero L-scale yield null fits, never
    * errors. Output: (group, n_blocks, location 4dp, scale 4dp,
    * l_skew 4dp, l_skew_gap 4dp, rl_20 4dp, rl_100 4dp). */
  def gumbelBlockMaxima(df: DataFrame, groupCol: String,
                        blockCol: String,
                        valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("double")
    val bm = df.filter(v.isNotNull)
      .groupBy(col(groupCol), col(blockCol))
      .agg(max(v).as("__m"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__m").asc)
    val ranked = bm
      .withColumn("__r", row_number().over(w).cast("double"))
    val agg = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_blocks"),
      sum(col("__m")).as("__s0"),
      sum((col("__r") - 1.0) * col("__m")).as("__s1"),
      sum((col("__r") - 1.0) * (col("__r") - 2.0) * col("__m"))
        .as("__s2"))
    val n = col("n_blocks").cast("double")
    val b0 = col("__s0") / n
    val b1 = col("__s1") / (n * (n - 1.0))
    val b2 = col("__s2") / (n * (n - 1.0) * (n - 2.0))
    val l1 = b0
    val l2 = lit(2.0) * b1 - b0
    val t3 = (lit(6.0) * b2 - lit(6.0) * b1 + b0) /
      nullif(l2, lit(0.0))
    val usable = col("n_blocks") >= 3
    val beta = when(usable, l2 / log(lit(2.0)))
    val mu = when(usable, l1 - lit(0.5772156649015329) * beta)
    def rl(t: Double): org.apache.spark.sql.Column =
      mu - beta * log(-log(lit(1.0) - lit(1.0) / lit(t)))
    val gumbelT3 = lit(2.0) * log(lit(3.0)) / log(lit(2.0)) - lit(3.0)
    agg.select(col(groupCol), col("n_blocks"),
      round(mu, 4).as("location"),
      round(beta, 4).as("scale"),
      round(when(usable, t3), 4).as("l_skew"),
      round(when(usable, t3 - gumbelT3), 4).as("l_skew_gap"),
      round(rl(20.0), 4).as("rl_20"),
      round(rl(100.0), 4).as("rl_100"))
  }
}
