package graft.de

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.gfunctions.normal_sf

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

  /** Stratified two-proportion z-test (X76): per stratum, the pooled
    * z-statistic for conversion-rate difference between two groups —
    * z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)), p̂ the pooled
    * rate. Every input to the formula is an exact integer count per
    * (stratum, group), so z is one deterministic double expression per
    * STRATUM row (4-dp). The p-value is left to the caller's normal
    * table — reporting the statistic keeps the operator engine-exact
    * and DuckDB-oracle-able (no erf on either side). Strata with a
    * group missing or a degenerate pooled rate (p̂ ∈ {0,1}) yield null
    * z. `success` is any boolean column expression name.
    *
    * Output: (stratum, n_a, x_a, n_b, x_b, p_a 6dp, p_b 6dp, z 4dp).
    * One hash aggregate over facts; strata-bounded output. */
  /** Poisson rate-ratio test: events per exposure unit in group `a` vs
    * group `b` (each input row = one exposure unit, `event` a boolean
    * event marker). RR = (x_a/t_a)/(x_b/t_b); the log-RR standard
    * error is the Poisson √(1/x_a + 1/x_b); two-sided p from
    * [[graft.functions.gfunctions.normal_sf]]. One conditional
    * aggregate. Output (one row): x_a, t_a, x_b, t_b, rate_a 6dp,
    * rate_b 6dp, rate_ratio 4dp, z 4dp, p_value 6dp — null z/p when
    * either event count is zero (the log scale is undefined there).
    */
  def rateRatio(df: DataFrame, group: String, a: String, b: String,
                event: String): DataFrame = {
    val isA = col(group) === a
    val isB = col(group) === b
    val e = col(event).cast("long")
    val agg = df.filter(isA || isB).agg(
      sum(when(isA, e).otherwise(0L)).as("x_a"),
      sum(when(isA, 1L).otherwise(0L)).as("t_a"),
      sum(when(isB, e).otherwise(0L)).as("x_b"),
      sum(when(isB, 1L).otherwise(0L)).as("t_b"))
    val ra = col("x_a").cast("double") / nullif(col("t_a"), lit(0L))
    val rb = col("x_b").cast("double") / nullif(col("t_b"), lit(0L))
    val rr = ra / nullif(rb, lit(0.0))
    val se = sqrt(lit(1.0) / col("x_a") + lit(1.0) / col("x_b"))
    val z = log(rr) / se
    val ok = col("x_a") > 0 && col("x_b") > 0
    agg.select(col("x_a"), col("t_a"), col("x_b"), col("t_b"),
      round(ra, 6).as("rate_a"), round(rb, 6).as("rate_b"),
      round(rr, 4).as("rate_ratio"),
      when(ok, round(z, 4)).as("z"),
      when(ok, round(lit(2.0) * normal_sf(abs(z)), 6)).as("p_value"))
  }

  /** 2×2 difference-in-differences readout: cell means of `value` over
    * (treated?, post?) and the DiD estimate
    * (T,post − T,pre) − (C,post − C,pre). `treated` and `post` are
    * boolean column names (callers precompute the cohort and period
    * predicates). One hash aggregate of conditional sufficient
    * statistics; the estimate is computed from unrounded means and
    * rounded last. Output (one row): n, n_treated, mean_t_pre,
    * mean_t_post, mean_c_pre, mean_c_post (4dp), did_estimate (4dp).
    */
  def didEstimate(df: DataFrame, treated: String, post: String,
                  value: String): DataFrame = {
    val v = col(value).cast("double")
    val tr = col(treated)
    val po = col(post)
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(when(tr, 1L).otherwise(0L)).as("n_treated"),
      avg(when(tr && !po, v)).as("__tp0"),
      avg(when(tr && po, v)).as("__tp1"),
      avg(when(!tr && !po, v)).as("__cp0"),
      avg(when(!tr && po, v)).as("__cp1"))
    agg.select(col("n"), col("n_treated"),
      round(col("__tp0"), 4).as("mean_t_pre"),
      round(col("__tp1"), 4).as("mean_t_post"),
      round(col("__cp0"), 4).as("mean_c_pre"),
      round(col("__cp1"), 4).as("mean_c_post"),
      round((col("__tp1") - col("__tp0")) - (col("__cp1") - col("__cp0")), 4)
        .as("did_estimate"))
  }

  def twoProportionZ(df: DataFrame, stratum: String, group: String,
                     success: String, a: String, b: String): DataFrame = {
    val isA = col(group) === a
    val isB = col(group) === b
    val s = col(success).cast("long")
    val agg = df.filter(isA || isB)
      .groupBy(col(stratum))
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("n_a"),
        sum(when(isA, s).otherwise(0L)).as("x_a"),
        sum(when(isB, 1L).otherwise(0L)).as("n_b"),
        sum(when(isB, s).otherwise(0L)).as("x_b"))
    // nullif guards keep the whole readout ANSI-safe: an empty group
    // yields null rate/z, never a division error.
    val pa = col("x_a").cast("double") / nullif(col("n_a"), lit(0L))
    val pb = col("x_b").cast("double") / nullif(col("n_b"), lit(0L))
    val pp = (col("x_a") + col("x_b")).cast("double") /
      nullif(col("n_a") + col("n_b"), lit(0L))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / nullif(col("n_a"), lit(0L)) +
        lit(1.0) / nullif(col("n_b"), lit(0L))))
    agg.select(col(stratum), col("n_a"), col("x_a"), col("n_b"),
      col("x_b"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && pp > 0 && pp < 1,
        round((pa - pb) / se, 4)).as("z"))
  }

  /** Cochran–Armitage trend test: is a binary outcome's rate MONOTONE
    * in an ordered dose — the dose-response screen that a plain k-group
    * chi-square throws away ordering information on. With per-dose
    * (score w_i, n_i, successes r_i) and overall p̄ = R/N:
    * T = Σ w_i (r_i − n_i·p̄), Var(T) = p̄(1−p̄)(Σ w_i² n_i −
    * (Σ w_i n_i)²/N), Z = T/√Var. Everything reduces from ONE
    * conditional aggregate over facts into a dose-bounded frame, then a
    * single-row readout; r/n/N are exact BIGINTs. doseCol must be
    * numeric scores (ordinal levels mapped upstream). Complete-case
    * on BOTH columns (fuzz-16 finding: a null dose/outcome used to
    * count in N but vanish from the weighted sums — the q315 "three
    * answers to one null" class). Output one row:
    * (n BIGINT, n_doses BIGINT, t_stat 4dp, z 4dp, chi2 4dp). */
  def cochranArmitage(df: DataFrame, doseCol: String,
                      successCol: String): DataFrame = {
    val perDose = df
      .filter(col(doseCol).isNotNull && col(successCol).isNotNull)
      .groupBy(col(doseCol).cast("double").as("__w"))
      .agg(count(lit(1)).as("__n"),
        sum(col(successCol).cast("long")).as("__r"))
    val agg = perDose.agg(
      sum(col("__n")).as("N"), sum(col("__r")).as("R"),
      count(lit(1)).as("n_doses"),
      sum(col("__w") * col("__r")).as("__wr"),
      sum(col("__w") * col("__n")).as("__wn"),
      sum(col("__w") * col("__w") * col("__n")).as("__wwn"))
    val pbar = col("R").cast("double") / col("N")
    val t = col("__wr") - pbar * col("__wn")
    val v = pbar * (lit(1.0) - pbar) *
      (col("__wwn") - col("__wn") * col("__wn") / col("N"))
    val z = t / sqrt(nullif(v, lit(0.0)))
    agg.select(col("N").as("n"), col("n_doses"),
      round(t, 4).as("t_stat"), round(z, 4).as("z"),
      round(z * z, 4).as("chi2"))
  }

  /** Directly standardized rates: per group, the event rate REWEIGHTED
    * to the pooled population's stratum mix — the epidemiology classic
    * that makes two groups with different age/priority structures
    * comparable (a crude-rate gap can be pure composition; the
    * standardized gap is not). Standard population = the pooled
    * stratum sizes across all groups. Two aggregates over one scan +
    * a stratum-bounded broadcast join. Output per group: (group,
    * n BIGINT, crude_rate 6dp, std_rate 6dp — null when a group is
    * missing a stratum entirely, surfaced rather than silently
    * re-normalized). */
  def standardizedRates(df: DataFrame, groupCol: String,
                        stratumCol: String,
                        eventCol: String): DataFrame = {
    val e = col(eventCol).cast("long")
    val cell = df.groupBy(col(groupCol).as("__g"),
        col(stratumCol).as("__s"))
      .agg(count(lit(1)).as("__n"), sum(e).as("__x"))
    val ref = cell.groupBy(col("__s"))
      .agg(sum(col("__n")).as("__ns"))
    val refTot = ref.agg(sum(col("__ns")).as("__nt"))
    val nStrata = ref.count()
    val rate = col("__x").cast("double") / col("__n")
    cell.join(broadcast(ref), Seq("__s"))
      .crossJoin(broadcast(refTot))
      .groupBy(col("__g"))
      .agg(sum(col("__n")).as("n"),
        count(lit(1)).as("__k"),
        sum(col("__x")).as("__xx"),
        sum(rate * col("__ns").cast("double") / col("__nt"))
          .as("__std"))
      .select(col("__g").as(groupCol), col("n"),
        round(col("__xx").cast("double") / col("n"), 6).as("crude_rate"),
        when(col("__k") === nStrata, round(col("__std"), 6))
          .as("std_rate"))
  }

  /** Mantel–Haenszel pooled odds ratio + Cochran–Mantel–Haenszel χ²
    * across stratified 2×2 tables — "is the exposure–outcome
    * association real once the confounder is held fixed" (the
    * stratified big brother of a single 2×2; [[graft.de.Inference
    * .fisherExact]] is its small-sample per-stratum sibling).
    * OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ); CMH χ² (1 df, no continuity
    * correction) = (Σaᵢ − ΣEᵢ)² / ΣVᵢ with the standard hypergeometric
    * Eᵢ/Vᵢ. One conditional aggregate to the stratum grain, one
    * readout row. Output: (n_strata BIGINT, n BIGINT, or_mh 4dp,
    * chi2 4dp, p_value 6dp). */
  def mantelHaenszel(df: DataFrame, stratumCol: String, xCol: String,
                     yCol: String): DataFrame = {
    import graft.functions.gfunctions.normal_sf
    val x = col(xCol) === 1
    val y = col(yCol) === 1
    val cell = df.groupBy(col(stratumCol).as("__s"))
      .agg(count(when(x && y, 1)).as("a"),
        count(when(x && !y, 1)).as("b"),
        count(when(!x && y, 1)).as("c"),
        count(when(!x && !y, 1)).as("d"))
      .withColumn("__n",
        (col("a") + col("b") + col("c") + col("d")).cast("double"))
    val m1 = (col("a") + col("b")).cast("double")
    val m0 = (col("c") + col("d")).cast("double")
    val n1 = (col("a") + col("c")).cast("double")
    val n0 = (col("b") + col("d")).cast("double")
    val ei = m1 * n1 / col("__n")
    val vi = when(col("__n") > 1,
      m1 * m0 * n1 * n0 / (col("__n") * col("__n") * (col("__n") - 1)))
      .otherwise(lit(0.0))
    val agg = cell.agg(count(lit(1)).as("n_strata"),
      sum(col("__n")).cast("long").as("n"),
      sum(col("a") * col("d") / col("__n")).as("__num"),
      sum(col("b") * col("c") / col("__n")).as("__den"),
      sum(col("a")).cast("double").as("__sa"),
      sum(ei).as("__se"), sum(vi).as("__sv"))
    val chi2 = pow(col("__sa") - col("__se"), 2) /
      nullif(col("__sv"), lit(0.0))
    agg.select(col("n_strata"), col("n"),
      round(col("__num") / nullif(col("__den"), lit(0.0)), 4)
        .as("or_mh"),
      round(chi2, 4).as("chi2"),
      round(lit(2.0) * normal_sf(sqrt(chi2)), 6).as("p_value"))
  }

  /** McNemar's test per stratum over paired 0/1 outcomes (pre, post) —
    * did a within-subject intervention move the marginal rate; only
    * the DISCORDANT pairs carry information: χ² = (b−c)²/(b+c) with
    * b = pre-only, c = post-only (plus the Edwards continuity-corrected
    * variant, the default in most packages). One conditional
    * aggregate. Output per stratum: (stratum, n BIGINT, b BIGINT,
    * c BIGINT, chi2 4dp, chi2_cc 4dp — nulls when b + c = 0). */
  def mcnemar(df: DataFrame, stratumCol: String, preCol: String,
              postCol: String): DataFrame = {
    val pre = col(preCol) === 1
    val post = col(postCol) === 1
    val agg = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"),
        count(when(pre && !post, 1)).as("b"),
        count(when(!pre && post, 1)).as("c"))
    val bc = (col("b") + col("c")).cast("double")
    val diff = (col("b") - col("c")).cast("double")
    agg.select(col(stratumCol), col("n"), col("b"), col("c"),
      round(diff * diff / nullif(bc, lit(0.0)), 4).as("chi2"),
      round(pow(greatest(abs(diff) - 1, lit(0.0)), 2) /
        nullif(bc, lit(0.0)), 4).as("chi2_cc"))
  }

  /** Cohen's h per stratum — the effect size for two proportions
    * (2·asin√p₁ − 2·asin√p₂, the variance-stabilizing arcsine scale
    * where a given h means the same detectability at any base rate —
    * the power-analysis companion to [[twoProportionZ]]'s
    * significance). Output per stratum: (stratum, n_a, n_b BIGINT,
    * p_a, p_b 6dp, cohens_h 4dp). */
  def cohensH(df: DataFrame, stratumCol: String, groupCol: String,
              successCol: String, a: String, b: String): DataFrame = {
    val isA = col(groupCol) === a
    val isB = col(groupCol) === b
    val s = col(successCol).cast("long")
    val agg = df.filter(isA || isB).groupBy(col(stratumCol))
      .agg(count(when(isA, 1)).as("n_a"),
        sum(when(isA, s).otherwise(0L)).as("x_a"),
        count(when(isB, 1)).as("n_b"),
        sum(when(isB, s).otherwise(0L)).as("x_b"))
    val pa = col("x_a").cast("double") / nullif(col("n_a"), lit(0L))
    val pb = col("x_b").cast("double") / nullif(col("n_b"), lit(0L))
    agg.select(col(stratumCol), col("n_a"), col("n_b"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      round(lit(2.0) * asin(sqrt(pa)) - lit(2.0) * asin(sqrt(pb)), 4)
        .as("cohens_h"))
  }

  /** Woolf confidence interval for the per-stratum odds ratio:
    * ln OR ± z·√(1/a + 1/b + 1/c + 1/d) — the readout that belongs
    * next to [[mantelHaenszel]]'s pooled point estimate (a CI
    * excluding 1 is the decision users actually make). Zero cells
    * yield null OR/CI (surfaced; Haldane-correct upstream if
    * desired). Output per stratum: (stratum, a, b, c, d BIGINT,
    * odds_ratio 4dp, ci_lo 4dp, ci_hi 4dp). */
  def oddsRatioCi(df: DataFrame, stratumCol: String, xCol: String,
                  yCol: String, z: Double = 1.959964): DataFrame = {
    val x = col(xCol) === 1
    val y = col(yCol) === 1
    val agg = df.groupBy(col(stratumCol))
      .agg(count(when(x && y, 1)).as("a"),
        count(when(x && !y, 1)).as("b"),
        count(when(!x && y, 1)).as("c"),
        count(when(!x && !y, 1)).as("d"))
    val ok = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0
    val or = col("a") * col("d") / (col("b") * col("c")).cast("double")
    val se = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
      lit(1.0) / col("c") + lit(1.0) / col("d"))
    agg.select(col(stratumCol), col("a"), col("b"), col("c"), col("d"),
      when(ok, round(or, 4)).as("odds_ratio"),
      when(ok, round(exp(log(or) - lit(z) * se), 4)).as("ci_lo"),
      when(ok, round(exp(log(or) + lit(z) * se), 4)).as("ci_hi"))
  }

  /** Experiment-sizing readout: the minimum detectable effect (MDE)
    * of a two-proportion test at the CURRENT traffic — per group,
    * with baseline rate p from the success indicator and n/2 units
    * per arm, MDE_abs = (z_{α/2} + z_β)·√(2p(1−p)/(n/2)) at
    * α = 0.05 / power 80% (z constants 1.959964, 0.841621) — "what
    * lift could this segment even detect", the go/no-go check BEFORE
    * launching a test, inverse of the q175 z-test. Output: (group,
    * n BIGINT, base_rate 6dp, n_per_arm BIGINT, mde_abs 6dp,
    * mde_rel 4dp); degenerate rates (0 or 1) yield null MDE. */
  def mdeAtCurrentTraffic(df: DataFrame, groupCol: String,
                          xCol: String): DataFrame = {
    val x = col(xCol).cast("int")
    val a = df.filter(x.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), avg(x.cast("double")).as("__p"))
    val nArm = floor(col("n") / 2).cast("long")
    val p = col("__p")
    val mde = when(p > 0 && p < 1,
      lit(1.959964 + 0.841621) *
        sqrt(lit(2.0) * p * (lit(1.0) - p) / nArm))
    a.select(col(groupCol), col("n"),
      round(p, 6).as("base_rate"),
      nArm.as("n_per_arm"),
      round(mde, 6).as("mde_abs"),
      round(mde / p, 4).as("mde_rel"))
  }

  /** Historical bandit-policy regret: treat each group as an arm and
    * the observed traffic as the pulls; regret of the logged policy =
    * Σ_arm n_arm·(best mean reward − arm mean reward) — how much
    * reward the logged allocation left on the table against the
    * oracle-best single arm (the offline readout that motivates
    * moving from an A/B split to a bandit). Output per arm: (arm,
    * n_pulls BIGINT, mean_reward 4dp, regret 4dp, regret_share 4dp
    * of the total, total_regret 4dp repeated). */
  def banditRegret(df: DataFrame, armCol: String,
                   rewardCol: String): DataFrame = {
    val r = col(rewardCol).cast("double")
    val arms = df.filter(r.isNotNull)
      .groupBy(col(armCol))
      .agg(count(lit(1)).as("n_pulls"), avg(r).as("__m"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val best = max(col("__m")).over(wAll)
    val regret = col("n_pulls") * (best - col("__m"))
    arms.select(col(armCol), col("n_pulls"),
      round(col("__m"), 4).as("mean_reward"),
      round(regret, 4).as("regret"),
      round(regret / nullif(sum(regret).over(wAll), lit(0.0)), 4)
        .as("regret_share"),
      round(sum(regret).over(wAll), 4).as("total_regret"))
  }

  /** Nearest-neighbor covariate matching ATT per stratum — the third
    * classic causal readout next to CUPED and DiD: each TREATED unit
    * is matched to the control with the closest covariate value
    * (exact-distance ties break toward the LOWER control covariate —
    * deterministic), ATT = mean(y_treated − y_matched_control).
    * 1-NN with replacement on a scalar covariate reduces to a sorted
    * sweep: controls and treated union-sorted by x per stratum, each
    * treated row reads its nearest preceding and following control
    * via running-last / reversed-running-last windows — NO pairwise
    * join, O(n log n) per stratum at any scale. Output: (stratum,
    * n_treated BIGINT, n_controls BIGINT, att 4dp,
    * avg_match_dist 4dp); treated rows in strata with no control
    * drop out (count visible via n_controls on surviving strata). */
  def nnMatchedAtt(df: DataFrame, stratumCol: String, treatCol: String,
                   xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val t = col(treatCol).cast("int")
    val base = df.filter(x.isNotNull && y.isNotNull && t.isNotNull)
      .select(col(stratumCol).as("__s"), t.as("__t"), x.as("__x"),
        y.as("__y"))
    // union sweep: at equal x, controls sort BEFORE treated (so an
    // exact-x control is "preceding" = the tie winner toward lower x)
    // __y in the sort keys: two controls at the SAME covariate value
    // must resolve to one deterministic match (the running-last picks
    // the frame's sort-maximal row)
    val wFwd = Window.partitionBy(col("__s"))
      .orderBy(col("__x"), col("__t"), col("__y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBwd = Window.partitionBy(col("__s"))
      .orderBy(col("__x").desc, col("__t").desc, col("__y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cx = when(col("__t") === 0, col("__x"))
    val cy = when(col("__t") === 0, col("__y"))
    val swept = base
      .withColumn("__px", last(cx, ignoreNulls = true).over(wFwd))
      .withColumn("__py", last(cy, ignoreNulls = true).over(wFwd))
      .withColumn("__nx", last(cx, ignoreNulls = true).over(wBwd))
      .withColumn("__ny", last(cy, ignoreNulls = true).over(wBwd))
    val dPrev = abs(col("__x") - col("__px"))
    val dNext = abs(col("__x") - col("__nx"))
    val usePrev = col("__nx").isNull ||
      (col("__px").isNotNull && dPrev <= dNext)
    val matched = swept.filter(col("__t") === 1 &&
        (col("__px").isNotNull || col("__nx").isNotNull))
      .select(col("__s"),
        (col("__y") - when(usePrev, col("__py")).otherwise(col("__ny")))
          .as("__eff"),
        when(usePrev, dPrev).otherwise(dNext).as("__dist"))
    val counts = base.groupBy(col("__s"))
      .agg(sum(when(col("__t") === 1, 1L).otherwise(0L))
        .as("n_treated"),
        sum(when(col("__t") === 0, 1L).otherwise(0L))
          .as("n_controls"))
    counts.join(
        matched.groupBy(col("__s"))
          .agg(round(avg(col("__eff")), 4).as("att"),
            round(avg(col("__dist")), 4).as("avg_match_dist")),
        Seq("__s"))
      .select(col("__s").as(stratumCol), col("n_treated"),
        col("n_controls"), col("att"), col("avg_match_dist"))
  }

  /** Cochran's Q test for k correlated proportions: did the success
    * rate differ across k treatments applied to the SAME blocks
    * (the k-treatment generalization of McNemar)? Input is long
    * (block, treatment, x 0/1); a (block, treatment) cell absent from
    * the input counts as 0 — the natural encoding for "did the user
    * convert in period j" logs where absence IS failure (documented
    * contract; duplicates are OR-ed). Q = (k−1)·(k·ΣG_j² − T²) /
    * (k·ΣL_i − ΣL_i²) with G_j the treatment successes, L_i the block
    * successes, T = ΣG_j. χ²_{k−1} under H0; the p-value is emitted
    * only for dof = 2 (k = 3, exactly exp(−Q/2)), null otherwise.
    * Blocks with L_i = 0 or L_i = k contribute nothing (standard).
    * Output (one row): (k INT, n_blocks BIGINT, q 4dp, dof INT,
    * p_value 6dp). */
  def cochranQ(df: DataFrame, block: String, treatment: String,
               xCol: String): DataFrame = {
    val cell = df.groupBy(col(block).as("__b"),
        col(treatment).as("__t"))
      .agg(max(col(xCol).cast("int")).as("__x"))
    val k = cell.select(col("__t")).distinct().count()
    val g = cell.groupBy(col("__t"))
      .agg(sum(col("__x")).as("__g"))
      .agg(sum(col("__g")).as("__T"),
        sum(col("__g") * col("__g")).as("__G2"))
    val l = cell.groupBy(col("__b"))
      .agg(sum(col("__x")).as("__l"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("__l")).as("__L1"),
        sum(col("__l") * col("__l")).as("__L2"))
    val kD = lit(k.toDouble)
    g.crossJoin(l)
      .select(lit(k.toInt).as("k"), col("n_blocks"),
        round((kD - 1) * (kD * col("__G2") - col("__T") * col("__T")) /
          nullif(kD * col("__L1") - col("__L2"), lit(0.0)), 4).as("q"),
        lit((k - 1).toInt).as("dof"))
      .withColumn("p_value",
        when(col("dof") === 2, round(exp(-col("q") / 2.0), 6)))
  }

  /** Wald sequential probability ratio test (SPRT, Wald 1945) for a
    * Bernoulli rate, per group: the cumulative log-likelihood ratio
    * ln L = x·ln(p1/p0) + (n−x)·ln((1−p1)/(1−p0)) walked over the
    * observation order, against the decision boundaries
    * ln B = ln(β/(1−α)) (accept H0) and ln A = ln((1−β)/α) (accept
    * H1). Output per group: (group, n BIGINT, x BIGINT, llr 6dp final,
    * decision 'accept_h1'|'accept_h0'|'continue', n_decision BIGINT —
    * the first sample index whose running LLR crossed a boundary, null
    * while 'continue'). Decision is taken at the FIRST crossing (the
    * sequential semantics), not the final value: a walk that touched
    * ln A and drifted back still stops at H1.
    *
    * One cumulative window per group over the observation grain plus a
    * conditional-min readout — no iteration, no driver loop. */
  def sprtBernoulli(df: DataFrame, groupCol: String,
                    orderCols: Seq[String], xCol: String,
                    p0: Double, p1: Double, alpha: Double = 0.05,
                    beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      "p0, p1 in (0,1) and distinct")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1)
    val lnA = math.log((1 - beta) / alpha)
    val lnB = math.log(beta / (1 - alpha))
    val wPos = math.log(p1 / p0)
    val wNeg = math.log((1 - p1) / (1 - p0))
    val x = col(xCol).cast("int")
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val walked = df
      .withColumn("__llr", sum(
        when(x === 1, lit(wPos)).otherwise(lit(wNeg))).over(wCum))
      .withColumn("__i", count(lit(1)).over(wCum))
    walked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x.cast("long")).as("x"),
        min(when(col("__llr") >= lnA, col("__i"))).as("__hit1"),
        min(when(col("__llr") <= lnB, col("__i"))).as("__hit0"))
      .select(col(groupCol), col("n"), col("x"),
        // the final LLR is a closed form of the totals — no need to
        // carry the last window row through the aggregate
        round(col("x") * wPos + (col("n") - col("x")) * wNeg, 6)
          .as("llr"),
        when(col("__hit1").isNotNull &&
          (col("__hit0").isNull || col("__hit1") <= col("__hit0")),
          lit("accept_h1"))
          .when(col("__hit0").isNotNull, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"),
        least(col("__hit1"), col("__hit0")).as("n_decision"))
  }

  /** Mix/rate decomposition of a period-over-period mean change (the
    * Oaxaca–Blinder / Kitagawa decomposition): Δ = ȳ₁ − ȳ₀ splits
    * EXACTLY into Σ(w₁−w₀)·r₀ (mix: the stratum composition moved) +
    * Σw₀·(r₁−r₀) (rate: within-stratum behavior moved) +
    * Σ(w₁−w₀)(r₁−r₀) (interaction) — the "why did the metric move"
    * answer a week-over-week dashboard actually needs. A stratum
    * absent from one period takes the other period's rate as its
    * baseline (coalesce), which keeps the identity exact instead of
    * dropping the stratum's contribution. One conditional aggregate
    * to the stratum grain, one readout row. Output: (n_0, n_1 BIGINT,
    * mean_0, mean_1, delta, mix_effect, rate_effect, interaction —
    * all 6dp; the last three sum to delta by construction). */
  def mixDecomposition(df: DataFrame, periodCol: String,
                       stratumCol: String,
                       valueCol: String): DataFrame = {
    val p1 = col(periodCol) === 1
    val v = col(valueCol).cast("double")
    val cell = df.groupBy(col(stratumCol).as("__s"))
      .agg(count(when(!p1, 1)).as("__n0"),
        sum(when(!p1, v)).as("__x0"),
        count(when(p1, 1)).as("__n1"),
        sum(when(p1, v)).as("__x1"))
    val tot = cell.agg(sum(col("__n0")).as("__t0"),
      sum(col("__n1")).as("__t1"))
    val w0 = col("__n0").cast("double") / col("__t0")
    val w1 = col("__n1").cast("double") / col("__t1")
    val r0raw = col("__x0") / nullif(col("__n0").cast("double"), lit(0.0))
    val r1raw = col("__x1") / nullif(col("__n1").cast("double"), lit(0.0))
    val r0 = coalesce(r0raw, r1raw)
    val r1 = coalesce(r1raw, r0raw)
    cell.crossJoin(broadcast(tot))
      .agg(max(col("__t0")).as("n_0"), max(col("__t1")).as("n_1"),
        round(sum(w0 * r0), 6).as("mean_0"),
        round(sum(w1 * r1), 6).as("mean_1"),
        round(sum(w1 * r1) - sum(w0 * r0), 6).as("delta"),
        round(sum((w1 - w0) * r0), 6).as("mix_effect"),
        round(sum(w0 * (r1 - r0)), 6).as("rate_effect"),
        round(sum((w1 - w0) * (r1 - r0)), 6).as("interaction"))
  }

  /** Exact Bayesian A/B readout per stratum (X265): with uniform
    * Beta(1, 1) priors and binomial data, P(p_B > p_A) has the exact
    * closed form (Evan Miller, "Formulas for Bayesian A/B Testing")
    *
    *   P = Σ_{i=0}^{a₂−1} exp( lnB(a₁+i, b₁+b₂) − ln(b₂+i)
    *                           − lnB(1+i, b₂) − lnB(a₁, b₁) )
    *
    * with a₁ = s_A+1, b₁ = n_A−s_A+1, a₂ = s_B+1, b₂ = n_B−s_B+1 —
    * every Beta argument an integer, so ln B(x, y) =
    * lf(x−1) + lf(y−1) − lf(x+y−1) comes from the SAME shared
    * sequential Σln-factorial table as [[Inference.fisherExact]]
    * (q192's bit-identical-cross-engine discipline; no lgamma
    * approximations anywhere). No normal approximation, no MC
    * sampling — the posterior probability itself.
    *
    * Shape: one hash aggregate to per-stratum (s_A, n_A, s_B, n_B);
    * the summation grid is s_B+1 rows per stratum — SUCCESS-bounded,
    * never fact-bounded — each resolving 4 lf lookups against the
    * broadcast table (value-domain-bounded: max stratum n + 3 rows).
    * A billion facts cost the one aggregate; everything after is
    * margin arithmetic.
    *
    * Output per stratum: (stratum, n_a, s_a, n_b, s_b, rate_a 4dp,
    * rate_b 4dp, p_b_beats_a 6dp). Strata with an empty side emit
    * null p. */
  def bayesAb(df: DataFrame, stratumCol: String, groupCol: String,
              xCol: String, a: String = "A",
              b: String = "B"): DataFrame = {
    val spark = df.sparkSession
    val succ = col(xCol) === 1
    val cnt = df.filter(col(groupCol).isin(a, b))
      .groupBy(col(stratumCol).as("__s"))
      .agg(count(when(col(groupCol) === a, 1)).as("n_a"),
        count(when(col(groupCol) === a && succ, 1)).as("s_a"),
        count(when(col(groupCol) === b, 1)).as("n_b"),
        count(when(col(groupCol) === b && succ, 1)).as("s_b"))
      .withColumn("__a1", col("s_a") + 1)
      .withColumn("__b1", col("n_a") - col("s_a") + 1)
      .withColumn("__a2", col("s_b") + 1)
      .withColumn("__b2", col("n_b") - col("s_b") + 1)
    val maxN = cnt
      .agg(coalesce(max(col("n_a") + col("n_b")), lit(0L)))
      .head.getLong(0)
    // free guard (maxN already in hand): the ln-factorial cumsum below
    // single-sorts 0..maxN
    require(maxN <= 20000000L,
      s"bayesAb: largest stratum has $maxN rows — the shared " +
        "ln-factorial table would single-sort that domain; " +
        "pre-aggregate to cohort grain before calling")
    val wLf = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // shared ln-factorial table lf(i) = Σ_{j≤i} ln j — sequential
    // cumsum, bounded by the largest stratum size (+3 for the priors)
    val lnfact = spark.range(0L, maxN + 4)
      .select(col("id"),
        sum(when(col("id") > 0, log(col("id").cast("double")))
          .otherwise(0.0)).over(wLf).as("lf"))
    def lf(k: Column, alias: String) =
      broadcast(lnfact.select(col("id").as(s"__i$alias"),
        col("lf").as(s"__lf$alias")))
    // per-stratum constants: lnB(a1,b1) and the i-independent pieces
    // of lnB(a1+i, b1+b2) and lnB(1+i, b2)
    val const = Seq(
      (col("__a1") - 1, "a1m"), (col("__b1") - 1, "b1m"),
      (col("__a1") + col("__b1") - 1, "ab1"),
      (col("__b1") + col("__b2") - 1, "bb"),
      (col("__b2") - 1, "b2m"))
      .foldLeft(cnt) { case (d, (kc, nm)) =>
        d.join(lf(kc, nm), kc === col(s"__i$nm")).drop(s"__i$nm")
      }
    val grid = const.filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("__i", explode(sequence(lit(0L), col("__a2") - 1)))
    val terms = Seq(
      (col("__a1") + col("__i") - 1, "ai"),
      (col("__a1") + col("__i") + col("__b1") + col("__b2") - 1, "aib"),
      (col("__i"), "ii"),
      (col("__i") + col("__b2"), "ib"))
      .foldLeft(grid) { case (d, (kc, nm)) =>
        d.join(lf(kc, nm), kc === col(s"__i$nm")).drop(s"__i$nm")
      }
      .withColumn("__lnt",
        col("__lfai") + col("__lfbb") - col("__lfaib") -
          log((col("__b2") + col("__i")).cast("double")) -
          (col("__lfii") + col("__lfb2m") - col("__lfib")) -
          (col("__lfa1m") + col("__lfb1m") - col("__lfab1")))
    val p = terms.groupBy(col("__s"))
      .agg(sum(exp(col("__lnt"))).as("__p"))
    cnt.join(p, Seq("__s"), "left")
      .select(col("__s").as(stratumCol),
        col("n_a"), col("s_a"), col("n_b"), col("s_b"),
        round(col("s_a").cast("double") /
          nullif(col("n_a").cast("double"), lit(0.0)), 4).as("rate_a"),
        round(col("s_b").cast("double") /
          nullif(col("n_b").cast("double"), lit(0.0)), 4).as("rate_b"),
        round(col("__p"), 6).as("p_b_beats_a"))
  }
}
