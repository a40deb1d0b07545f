package graft.tools

/** The triaged allow-list for [[PlanHygiene]] findings on AUDITED
  * (lazy) catalog queries: every (query, finding-kind) pair that is
  * legitimate at 100 TB, with the reason. CatalogPlanAuditSpec asserts
  * each audited query's live findings are a subset of its entry here
  * (absent entry = zero findings allowed), that no entry is stale
  * (an allow-listed kind that no longer fires fails the suite), and
  * that `cartesian` is never allow-listed — a CartesianProduct has no
  * legitimate bounded form in this catalog.
  *
  * Two legitimate shapes exist:
  *
  *  - `nested-loop-join` (BroadcastNestedLoopJoinExec): Spark's plan
  *    for a cross join against a broadcast side that is a ≤1-row
  *    aggregate frame (a grand total, a fitted parameter row, a query
  *    vector) or a tiny literal grid (threshold sweeps, frequency
  *    grids, coalition masks). Probe cost is O(|fact| × |tiny|) with
  *    the tiny side literal-bounded — scale-safe by construction.
  *  - `unpartitioned-window` (WindowExec with empty partitionSpec):
  *    a global sort window over a BOUNDED AGGREGATE DOMAIN (digit
  *    classes, contingency cells, calendar days, buckets, df-capped
  *    vocab) per the operator's documented contract — or the ≤2M
  *    small branch of a size-dispatched helper (`util.Ranks`), whose
  *    large branch is the distributed two-pass sweep.
  */
object PlanAllowlist {
  val NLJ = "nested-loop-join"
  val WIN = "unpartitioned-window"
  val UPS = "unpushed-scan-filter"

  private val scalarNlj =
    "broadcast side is a ≤1-row aggregate / parameter frame or tiny " +
      "literal grid — literal-bounded NLJ"

  private def nlj(names: String*): Seq[(String, Map[String, String])] =
    names.map(_ -> Map(NLJ -> scalarNlj))

  private def win(domain: String)(names: String*): Seq[(String, Map[String, String])] =
    names.map(_ -> Map(WIN -> s"global window over a bounded domain: $domain"))

  private def both(domain: String)(names: String*): Seq[(String, Map[String, String])] =
    names.map(_ -> Map(NLJ -> scalarNlj,
      WIN -> s"global window over a bounded domain: $domain"))

  private val computedPredicate =
    "the scan's only data filter is a computed-expression predicate " +
      "(hash-sample bucket, regex/token gate, derived cohort/bin) — " +
      "not expressible as a data-source Filter, so nothing is pushable " +
      "and the full scan is the query's semantics, not a lost pushdown"

  private def ups(names: String*): Seq[(String, Map[String, String])] =
    names.map(_ -> Map(UPS -> computedPredicate))

  private def nljUps(names: String*): Seq[(String, Map[String, String])] =
    names.map(_ -> Map(NLJ -> scalarNlj, UPS -> computedPredicate))

  val allowed: Map[String, Map[String, String]] = (
    nlj(
      "q7_minmax_composite", "q26_cosine_topk", "q59_token_kl",
      "q72_unigram_ppl", "q89_k_anonymity", "q91_weighted_sample",
      "q114_quantile_norm", "q150_bigram_ppl",
      "q158_dormant_customers", "q164_cuped", "q167_theil",
      "q170_enrichment", "q171_mutual_info", "q183_graph_summary",
      
      "q203_psi", "q207_haversine", "q214_brier", "q229_cronbach",
      "q249_croston", "q251_periodogram", "q259_dow_index",
      "q264_mix_budget", "q267_negative_sampling", "q274_length_jsd",
      "q280_shapley", "q321_mix_decomposition",
      "q326_target_encoding", "q332_predictive_assoc",
      // round-14 batch: q427 = broadcast ≤10-row query set against the
      // corpus (the ANN/brute contract); q428 = one-row grand-total
      // budget frame
      "q427_ann_recall", "q428_crawl_budget",
      "q337_eb_shrinkage", "q348_cluster_validity", "q356_rbo",
      "q357_term_burstiness", "q364_dsir_scores", "q365_erlang_staffing",
      "q366_demand_classes", "q370_weighted_kappa", "q397_dispersion",
      "q398_fleiss_kappa", "q399_krippendorff", "q401_gwet_ac1",
      "q402_loo_influence", "q407_rrf_fusion",
      "q411_dtw_activity") ++
    win("nation-keyed degree table (≤25 vertices)")("q12_degree_centrality") ++
    win("threshold-grid sweep table")("q65_gate_sweep") ++
    win("contingency cells (category-pair grain)")(
      "q115_chi2", "q188_cramers_v") ++
    win("pre-aggregated skyline frontier (brand/segment grain)")(
      "q148_skyline") ++
    win("9 leading-digit classes")("q151_benford") ++
    win("item-grain reliability table")("q213_reliability") ++
    win("rank-indexed vocab (df-capped; zipf slope over top ranks)")(
      "q236_zipf") ++
    win("quasi-identifier equivalence classes")("q244_l_diversity") ++
    win("rank window over a limit(topK) frame — top-k FIRST " +
      "(TakeOrderedAndProject), bounded by construction")(
      "q247_rake_keywords") ++
    win("calendar-day series")("q273_variance_ratio", "q351_granger") ++
    win("7×24 day-hour cells")("q282_dow_hour_heatmap") ++
    win("log2 magnitude buckets")("q283_log_histogram") ++
    win("state-transition cells")("q286_entropy_rate") ++
    win("rank-indexed vocab (documented vocab-bounded contract)")(
      "q294_vocab_coverage") ++
    win("template-signature classes")("q314_templates") ++
    win("score bins (WoE/IV bin grain)")("q325_woe_iv") ++
    win("time-step rounds (event-day grain)")("q369_bandit_regret") ++
    both("calendar-day run sequence")("q272_runs_test") ++
    both("df-capped bigram vocab")("q381_collocations") ++
    both("df-capped keyness vocab cells")("q396_keyness") ++
    ups("q45_hash_sample", "q48_pii_scrub", "q56_domains",
      "q83_padding_efficiency", "q136_spatial_nn", "q231_assortativity",
      "q361_bland_altman", "q403_eval_spans",
      // fuzz-23's positive-cents domain pin is a computed
      // round(price*100) > 0 predicate — not a pushable data filter
      "q178_pyth_means") ++
    // t-closeness: the release-wide distribution table is ≤ |sensitive
    // values| rows (global cum + totals ride a literal-partition
    // window the planner collapses to one partition), and the classes
    // × values dense grid is an aggregate-bounded broadcast NLJ
    both("release-wide sensitive-value distribution (m-bounded)")(
      "q413_t_closeness") ++
    win("decile-grain cumulative (≤ 11 score buckets by construction)")(
      "q419_qini") ++
    nljUps("q131_histogram", "q200_silhouette",
      "q201_classification_report", "q202_cohens_kappa") ++
    // q315's complete-case guard (fuzz-15) is a plain IS NOT NULL the
    // scan now pushes, so only the 1-row-total NLJ remains
    nlj("q315_g_test")
  ).toMap
}
