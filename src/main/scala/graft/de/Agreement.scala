package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Method-agreement statistics: Bland–Altman limits of agreement for
  * two continuous measurements of the same units ("can method B
  * replace method A" — the question a correlation coefficient
  * famously CANNOT answer, Bland & Altman 1986), and the one-way
  * intraclass correlation ICC(1,1) for "how much of the variance is
  * between subjects vs noise" over repeated ratings — the continuous
  * sibling of Cohen's kappa (q202) and Cronbach's alpha (q229).
  * Both are one or two hash aggregates of sufficient statistics.
  */
object Agreement {

  /** Bland–Altman per group over paired columns: d = b − a,
    * LoA = mean(d) ± 1.96·sd(d) (sample sd), plus the share of pairs
    * outside the limits (≈ 5% when differences are normal — a
    * built-in sanity readout). Output: (group, n BIGINT, bias 4dp,
    * sd_diff 4dp, loa_lo 4dp, loa_hi 4dp, pct_outside 4dp); groups
    * with n < 2 yield null limits. */
  def blandAltman(df: DataFrame, groupCol: String, aCol: String,
                  bCol: String): DataFrame = {
    val d = col(bCol).cast("double") - col(aCol).cast("double")
    val base = df.filter(d.isNotNull)
      .select(col(groupCol).as("__g"), d.as("__d"))
    val stats = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), avg(col("__d")).as("__m"),
        stddev_samp(col("__d")).as("__sd"))
    val lo = col("__m") - lit(1.959964) * col("__sd")
    val hi = col("__m") + lit(1.959964) * col("__sd")
    base.join(broadcast(stats), Seq("__g"))
      .groupBy(col("__g"))
      .agg(max(col("n")).as("n"), max(col("__m")).as("__m"),
        max(col("__sd")).as("__sd"),
        avg(when(col("__d") < lo || col("__d") > hi, 1.0)
          .otherwise(0.0)).as("__out"))
      .select(col("__g").as(groupCol), col("n"),
        round(col("__m"), 4).as("bias"),
        round(col("__sd"), 4).as("sd_diff"),
        round(col("__m") - lit(1.959964) * col("__sd"), 4)
          .as("loa_lo"),
        round(col("__m") + lit(1.959964) * col("__sd"), 4)
          .as("loa_hi"),
        round(col("__out"), 4).as("pct_outside"))
  }

  /** One-way random-effects ICC(1,1) over long (subject, rating)
    * rows: from the one-way ANOVA decomposition, MSB = between-
    * subject mean square, MSW = within, k₀ = (Σk − Σk²/Σk)/(n−1)
    * the unbalanced-design effective group size, ICC = (MSB − MSW) /
    * (MSB + (k₀−1)·MSW). Subjects with a single rating contribute to
    * MSB only (standard). Output (one row): (n_subjects BIGINT,
    * n_ratings BIGINT, k0 4dp, msb 4dp, msw 4dp, icc 4dp);
    * degenerate designs yield nulls. */
  def iccOneWay(df: DataFrame, subject: String,
                value: String): DataFrame = {
    val v = col(value).cast("double")
    val per = df.filter(v.isNotNull)
      .groupBy(col(subject).as("__s"))
      .agg(count(lit(1)).as("__k"), sum(v).as("__sv"),
        sum(v * v).as("__sv2"))
    val agg = per.agg(count(lit(1)).as("n_subjects"),
      sum(col("__k")).as("n_ratings"),
      sum(col("__k") * col("__k")).as("__k2"),
      sum(col("__sv")).as("__tot"),
      sum(col("__sv2")).as("__tot2"),
      sum(col("__sv") * col("__sv") / col("__k")).as("__ssb"))
    val n = col("n_subjects").cast("double")
    val bigN = col("n_ratings").cast("double")
    val k0 = (bigN - col("__k2") / bigN) / nullif(n - 1, lit(0.0))
    val ssb = col("__ssb") - col("__tot") * col("__tot") / bigN
    val ssw = col("__tot2") - col("__ssb")
    val msb = ssb / nullif(n - 1, lit(0.0))
    val msw = ssw / nullif(bigN - n, lit(0.0))
    agg.select(col("n_subjects"), col("n_ratings"),
      round(k0, 4).as("k0"),
      round(msb, 4).as("msb"),
      round(msw, 4).as("msw"),
      round((msb - msw) / nullif(msb + (k0 - 1) * msw, lit(0.0)), 4)
        .as("icc"))
  }

  /** Fleiss' κ (X292; Fleiss 1971) — chance-corrected agreement for
    * k ≥ 2 raters assigning CATEGORICAL labels, the multi-rater
    * generalization Cohen's κ can't give (label quality crowdsourcing
    * runs on this): with n raters per item and n_ic the count of
    * raters putting item i in category c,
    *
    *   P_i = (Σ_c n_ic² − n)/(n(n−1)),  P̄ = mean,  P̄_e = Σ_c p_c²,
    *   κ = (P̄ − P̄_e)/(1 − P̄_e).
    *
    * Requires the CLASSIC constant-raters-per-item design — ragged
    * items make the statistic ill-defined, so they null the result
    * (use [[krippendorffAlpha]] for missing ratings). Everything is
    * exact BIGINT counts until the three closing ratios: one
    * (item, category) aggregate + one item aggregate + a
    * category-margin aggregate.
    *
    * Output (one row): n_items BIGINT, n_raters BIGINT,
    * n_categories BIGINT, p_bar 4dp, p_e 4dp, kappa 4dp (null on
    * ragged designs or P̄_e = 1). */
  def fleissKappa(df: DataFrame, itemCol: String,
                  categoryCol: String): DataFrame = {
    val cells = df
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("__i"),
        col(categoryCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
    val items = cells.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__m"),
        sum(col("__n") * col("__n")).as("__sq"))
    val iAgg = items.agg(count(lit(1)).as("n_items"),
      min(col("__m")).as("__mmin"), max(col("__m")).as("__mmax"),
      sum(col("__sq")).as("__sqsum"), sum(col("__m")).as("__tot"))
    val cats = cells.groupBy(col("__c"))
      .agg(sum(col("__n")).as("__nc"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("__nc") * col("__nc")).as("__nc2"))
    val j = iAgg.crossJoin(broadcast(cats))
    val n = col("__mmin").cast("double")
    val ok = col("__mmin") === col("__mmax") && col("__mmin") >= 2
    val pBar = (col("__sqsum") - col("__tot")).cast("double") /
      (col("n_items") * n * (n - 1))
    val pE = col("__nc2").cast("double") /
      (col("__tot") * col("__tot")).cast("double")
    j.select(col("n_items"),
      when(ok, col("__mmin")).as("n_raters"),
      col("n_categories"),
      when(ok, round(pBar, 4)).as("p_bar"),
      when(ok, round(pE, 4)).as("p_e"),
      when(ok && pE < 1.0,
        round((pBar - pE) / (lit(1.0) - pE), 4)).as("kappa"))
  }

  /** Gwet's AC1 (X295; Gwet 2008) — the multi-rater agreement
    * coefficient built for the PREVALENCE PARADOX that deflates
    * [[fleissKappa]]: when one category dominates (99% "ok" labels),
    * κ's chance term P̄_e → 1 and even excellent raters score near 0;
    * AC1's chance term e(γ) = Σ_c π_c(1−π_c)/(k−1) instead VANISHES
    * under extreme prevalence, so the coefficient stays informative.
    * Same observed agreement P̄ and constant-raters contract as
    * Fleiss (π_c = category share of ratings); identical exact-BIGINT
    * aggregate shape.
    *
    * Output (one row): n_items BIGINT, n_raters BIGINT,
    * n_categories BIGINT, p_bar 4dp, p_e_gamma 4dp, ac1 4dp (null on
    * ragged designs, k < 2 categories, or e(γ) = 1). */
  def gwetAc1(df: DataFrame, itemCol: String,
              categoryCol: String): DataFrame = {
    val cells = df
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("__i"),
        col(categoryCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
    val items = cells.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__m"),
        sum(col("__n") * col("__n")).as("__sq"))
    val iAgg = items.agg(count(lit(1)).as("n_items"),
      min(col("__m")).as("__mmin"), max(col("__m")).as("__mmax"),
      sum(col("__sq")).as("__sqsum"), sum(col("__m")).as("__tot"))
    val cats = cells.groupBy(col("__c"))
      .agg(sum(col("__n")).as("__nc"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("__nc") * col("__nc")).as("__nc2"))
    val j = iAgg.crossJoin(broadcast(cats))
    val n = col("__mmin").cast("double")
    val kD = col("n_categories").cast("double")
    val ok = col("__mmin") === col("__mmax") && col("__mmin") >= 2 &&
      col("n_categories") >= 2
    val pBar = (col("__sqsum") - col("__tot")).cast("double") /
      (col("n_items") * n * (n - 1))
    // e(γ) = Σ π(1−π)/(k−1) = (1 − Σπ²)/(k−1)
    val eGamma = (lit(1.0) - col("__nc2").cast("double") /
      (col("__tot") * col("__tot")).cast("double")) / (kD - 1)
    j.select(col("n_items"),
      when(ok, col("__mmin")).as("n_raters"),
      col("n_categories"),
      when(ok, round(pBar, 4)).as("p_bar"),
      when(ok, round(eGamma, 4)).as("p_e_gamma"),
      when(ok && eGamma < 1.0,
        round((pBar - eGamma) / (lit(1.0) - eGamma), 4)).as("ac1"))
  }

  /** Krippendorff's α, nominal metric (X293; Krippendorff 2004) —
    * the agreement coefficient that tolerates MISSING ratings and
    * any number of raters per item (the real shape of crowdsourced
    * label tables): from the coincidence matrix
    * o_ck = Σ_items n_ic·(n_ik − δ_ck)/(m_i − 1),
    *
    *   D_o = Σ_{c≠k} o_ck,  D_e = Σ_{c≠k} n_c·n_k/(n−1),
    *   α = 1 − D_o/D_e,
    *
    * where n_c are coincidence margins and n = Σ m_i over items with
    * m_i ≥ 2 (single-rating items carry no pairable information and
    * drop, the standard convention). For the nominal metric both
    * disagreement masses reduce to closed-form margins — NO category
    * pair join: D_o = Σ_i (m_i − Σ_c n_ic²/... ) folds to exact
    * integer sums of m_i and Σn_ic² scaled by 1/(m_i−1).
    *
    * Output (one row): n_items BIGINT (pairable), n_ratings BIGINT,
    * n_categories BIGINT, d_o 4dp, d_e 4dp, alpha 4dp (null when
    * D_e = 0 — fewer than 2 distinct categories). */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        categoryCol: String): DataFrame = {
    val cells = df
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("__i"),
        col(categoryCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
    val items = cells.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__m"),
        sum(col("__n") * col("__n")).as("__sq"))
      .filter(col("__m") >= 2)
    // nominal D_o per item: Σ_{c≠k} n_c n_k/(m−1) = (m² − Σn_c²)/(m−1)
    val iAgg = items.agg(count(lit(1)).as("n_items"),
      sum(col("__m")).as("n_ratings"),
      sum((col("__m") * col("__m") - col("__sq")).cast("double") /
        (col("__m") - 1)).as("__do"))
    // margins over the same pairable items only
    val cats = cells.join(items.select(col("__i")), Seq("__i"))
      .groupBy(col("__c")).agg(sum(col("__n")).as("__nc"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("__nc") * col("__nc")).as("__nc2"),
        sum(col("__nc")).as("__nsum"))
    val j = iAgg.crossJoin(broadcast(cats))
    val dE = (col("__nsum") * col("__nsum") - col("__nc2"))
      .cast("double") / (col("__nsum") - 1)
    j.select(col("n_items"), col("n_ratings"), col("n_categories"),
      round(col("__do"), 4).as("d_o"),
      round(dE, 4).as("d_e"),
      when(dE > 0.0, round(lit(1.0) - col("__do") / dE, 4))
        .as("alpha"))
  }
}
