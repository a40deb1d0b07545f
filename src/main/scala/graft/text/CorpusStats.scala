package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-composition diagnostics for training-data pipelines: when
  * mixing scraped sources, the question "how different is source s from
  * the blend?" decides mixture weights and flags collapsed/degenerate
  * slices before training does. */
object CorpusStats {

  /** Per-stratum token-distribution KL divergence against the whole
    * corpus: KL(P_s ‖ P) = Σ_t p(t|s)·ln(p(t|s)/p(t)). Every stratum's
    * support is a subset of the corpus support by construction, so the
    * divergence is finite without smoothing.
    *
    * Scale shape: one explode + one (stratum, term) hash aggregate —
    * map-side combined, shuffle volume ∝ |strata|×|vocab|, never the
    * token stream — then the corpus marginal is a SECOND partial
    * aggregate over those counts (not a rescan), joined back on the term
    * key (vocab-sized, co-partitioned). Stratum totals and the corpus
    * total are broadcast. Output: (stratum, n_tokens, n_terms, kl)
    * with kl rounded to 4 dp (cross-engine summation-order noise is
    * ~1e-15 relative — the q13 precedent).
    */
  def tokenDivergence(docs: DataFrame, strataCol: String,
                      textCol: String): DataFrame = {
    val tok = docs.select(col(strataCol).as("stratum"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val st = tok.groupBy("stratum", "term")
      .agg(count(lit(1)).as("c_st"))
    val termTot = st.groupBy("term").agg(sum(col("c_st")).as("c_t"))
    val stratTot = st.groupBy("stratum").agg(sum(col("c_st")).as("n_s"))
    val grand = stratTot.agg(sum(col("n_s")).as("n_total"))
    val ps = col("c_st").cast("double") / col("n_s").cast("double")
    val p = col("c_t").cast("double") / col("n_total").cast("double")
    st.join(termTot, Seq("term"))
      .join(broadcast(stratTot), Seq("stratum"))
      .crossJoin(broadcast(grand))
      .groupBy(col("stratum"))
      .agg(max(col("n_s")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        round(sum(ps * log(ps / p)), 4).as("kl_divergence"))
  }

  /** CCNet-style unigram language-model scoring: fit an add-one-smoothed
    * unigram LM on the corpus itself, then score every document by its
    * mean token negative log-likelihood (= log-perplexity). Documents
    * whose tokens are rare corpus-wide score high — the classic cheap
    * proxy that ranks boilerplate/gibberish above fluent text for
    * quality filtering, without shipping an external LM.
    *
    * p(t) = (c(t) + 1) / (N + V) with c(t) the corpus term count, N
    * total tokens, V vocab size; doc score = Σ_t c_d(t)·(−ln p(t)) /
    * n_d, rounded to 4 dp.
    *
    * Scale shape: one explode into a (doc, term) hash aggregate
    * (map-side combined — shuffle ∝ distinct doc-terms, not the token
    * stream), the corpus LM as a second partial aggregate over those
    * counts (vocab-sized, no rescan), joined back on the term key —
    * co-partitioned with the doc-term counts, so AQE plans it without a
    * second shuffle of the big side — then one per-doc aggregate. The
    * two LM scalars (N, V) broadcast. Nothing driver-side, nothing
    * quadratic; the corpus text is read once.
    *
    * Output: (idCol, n_tokens, logppl) — one row per document with at
    * least one token.
    */
  def unigramLogPerplexity(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val dt = docs.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("c_dt"))
    val lm = dt.groupBy("term").agg(sum(col("c_dt")).as("c_t"))
    val scalars = lm.agg(sum(col("c_t")).as("n_total"),
      count(lit(1)).as("v"))
    val negLogP = -log((col("c_t") + 1).cast("double") /
      (col("n_total") + col("v")).cast("double"))
    dt.join(lm, Seq("term"))
      .crossJoin(broadcast(scalars))
      .groupBy(col(idCol))
      .agg(sum(col("c_dt")).as("n_tokens"),
        round(sum(col("c_dt").cast("double") * negLogP) /
          sum(col("c_dt")).cast("double"), 4).as("logppl"))
  }
}
