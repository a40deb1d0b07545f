package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Signed-zero canonicalization for the oracle compare.
  *
  * The one hash-divergence class the value-rounding discipline cannot
  * close: Spark's `round` (BigDecimal HALF_UP) canonicalizes −0.0 to
  * +0.0 while DuckDB's `round` preserves the sign bit, so any SIGNED
  * rounded score whose magnitude rounds to zero (a tiny-negative
  * statistic — the q396 round-8 episode: G² ≈ −3e−6 at sf0.01) hashes
  * differently across engines even though every printed value agrees.
  *
  * Closure, applied centrally at catalog assembly so each new query
  * inherits it by listing its signed output columns here:
  *  - Spark side: `col + 0.0` per signed column (IEEE 754:
  *    −0.0 + 0.0 = +0.0; every other value, including NaN, is
  *    unchanged) — a no-op projection on top of the query's final sort.
  *  - Oracle side: `SELECT * REPLACE (col + 0.0 AS col) FROM (sql)` —
  *    DuckDB's star-REPLACE keeps column order and types.
  *
  * The columns listed are every double output that can go negative on
  * the test tables (enumerated by running each oracle at sf0.001 and
  * sf0.01 and taking per-column minima, plus the judge-named signed
  * effect scores) — the ±0.0-capable set. Unsigned columns (counts,
  * rates, p-values) cannot reach −0.0 and are left untouched.
  * `tools/selfcheck.py` distinguishes −0.0 from +0.0 (`--selftest`
  * pins that), so a regression in this closure fails the local gate
  * the same way it would fail the driver's hash.
  */
object SignedZero {

  /** query name → its signed (±0.0-capable) double output columns. */
  val signedCols: Map[String, Seq[String]] = Map(
    "q117_regression" -> Seq("slope"),
    "q11_corr_edges" -> Seq("corr_val"),
    "q130_naive_bayes" -> Seq("score"),
    "q134_seasonal_anomaly" -> Seq("z"),
    "q137_pca" -> Seq("loading"),
    "q13_welch_stats" -> Seq("t_stat"),
    "q142_spearman" -> Seq("spearman"),
    "q143_autocorr" -> Seq("acf"),
    "q145_trend" -> Seq("theil_sen"),
    "q14_welch_pvalue" -> Seq("t_stat"),
    "q151_benford" -> Seq("deviation"),
    "q163_holt_trend" -> Seq("trend"),
    "q164_cuped" -> Seq("var_reduction"),
    "q167_theil" -> Seq("between_term"),
    "q173_holt_winters" -> Seq("season_next", "trend"),
    "q175_two_proportion_z" -> Seq("z"),
    "q181_log_rank" -> Seq("z"),
    "q182_seasonal_decompose" -> Seq("residual", "seasonal"),
    "q183_graph_summary" -> Seq("assortativity"),
    "q192_readability" -> Seq("flesch_ease"),
    "q200_silhouette" -> Seq("mean_silhouette"),
    "q209_rolling_corr" -> Seq("roll_corr"),
    "q210_mom_growth" -> Seq("mom_pct"),
    "q216_mann_whitney" -> Seq("z"),
    "q218_effect_sizes" ->
      Seq("cohen_d", "glass_delta", "hedges_g", "mean_diff"),
    "q222_did" -> Seq("did_estimate"),
    "q223_fellegi_sunter" -> Seq("fs_score"),
    "q224_ols2" -> Seq("b1"),
    "q227_moments" -> Seq("kurtosis", "skewness"),
    "q228_partial_corr" -> Seq("r_xy", "r_xy_z", "r_yz"),
    "q229_cronbach" -> Seq("alpha"),
    "q230_modularity" -> Seq("q_contrib", "q_total"),
    "q231_assortativity" -> Seq("r"),
    "q234_meta_pool" -> Seq("pooled", "z"),
    "q240_elasticity" -> Seq("intercept", "slope"),
    "q255_corr_matrix" -> Seq("r_disc_tax", "r_price_tax",
      "r_qty_disc", "r_qty_price", "r_qty_tax"),
    "q263_dp_counts" -> Seq("noise"),
    "q290_cochran_armitage" -> Seq("t_stat", "z"),
    "q304_pacf" -> Seq("pacf1", "pacf2", "pacf3", "r1", "r2", "r3"),
    "q306_durbin_watson" -> Seq("slope"),
    "q317_cohens_h" -> Seq("cohens_h"),
    "q321_mix_decomposition" ->
      Seq("delta", "interaction", "rate_effect"),
    "q323_theil_sen" -> Seq("slope"),
    "q325_woe_iv" -> Seq("woe"),
    "q327_sprt" -> Seq("llr"),
    "q334_mann_kendall" -> Seq("z"),
    "q336_cooks_distance" -> Seq("residual"),
    "q345_cliffs_delta" -> Seq("delta"),
    "q346_wilcoxon" -> Seq("z"),
    "q347_ljung_box" -> Seq("r1", "r2"),
    "q355_nn_matching" -> Seq("att"),
    "q359_ad_two_sample" -> Seq("z"),
    "q360_gpd_tail" -> Seq("xi"),
    "q361_bland_altman" -> Seq("bias", "loa_lo"),
    "q362_icc" -> Seq("icc"),
    "q363_tost" -> Seq("diff"),
    "q364_dsir_scores" -> Seq("avg_log_ratio"),
    "q373_expected_shortfall" -> Seq("es_p", "var_p"),
    "q375_segmented_ols" -> Seq("slope_change", "slope_right"),
    "q379_logistic" -> Seq("b0", "b1", "b2"),
    "q384_poisson" -> Seq("b2"),
    "q385_huber" -> Seq("b1"),
    "q386_cox_ph" -> Seq("beta", "z"),
    "q389_aipw_ate" ->
      Seq("ate_aipw", "ate_naive", "ate_regression"),
    "q391_stump_boost" -> Seq("left_value", "right_value"),
    "q392_yuen_trimmed" -> Seq("t_stat"),
    "q394_jonckheere" -> Seq("z"),
    "q395_brunner_munzel" -> Seq("t_stat"),
    "q396_keyness" -> Seq("g2_signed"),
    "q398_fleiss_kappa" -> Seq("kappa"),
    "q399_krippendorff" -> Seq("alpha"),
    "q401_gwet_ac1" -> Seq("ac1"),
    "q5_zscore" -> Seq("z"),
    "q99_rate_anomaly" -> Seq("z"))

  /** Spark side: +0.0 the listed columns; the cast pins the original
    * column type so the projection can never shift the schema. */
  def canonDf(name: String, df: DataFrame): DataFrame =
    signedCols.get(name) match {
      case None => df
      case Some(cols) =>
        cols.foldLeft(df) { (d, c) =>
          d.withColumn(c,
            (col(c) + lit(0.0)).cast(d.schema(c).dataType))
        }
    }

  /** Oracle side: star-REPLACE the listed columns over the query. */
  def canonSql(name: String, sql: String): String =
    signedCols.get(name) match {
      case None => sql
      case Some(cols) =>
        val repl = cols.map(c => s"$c + 0.0 AS $c").mkString(", ")
        s"SELECT * REPLACE ($repl) FROM (\n$sql\n)"
    }
}
