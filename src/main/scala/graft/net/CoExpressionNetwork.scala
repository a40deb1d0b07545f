package graft.net

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-expression network construction (A9/A12, J4/J5, G1;
  * `pipeline2.py:661-724`).
  */
object CoExpressionNetwork {

  /** A12 (+A9 fallback): the gene set for the network.
    *
    * With significant genes: the first `n` in gene-sorted order — the
    * reference's "top 500" is the head of the groupby-SORTED index, not a
    * significance ranking (`pipeline2.py:679-680`, documented quirk
    * SURVEY §2.4 A12). Without: top `n` by sample variance, descending,
    * gene as the deterministic tiebreak (pandas stable sort,
    * `pipeline2.py:684-685`). Membership in the expression data (F8) is
    * enforced by construction (both branches derive from it).
    */
  def topGenes(geneExpr: DataFrame, significant: Option[DataFrame],
               n: Int = 500): DataFrame = {
    val sigNonEmpty = significant.filter(!_.isEmpty)
    sigNonEmpty match {
      case Some(sig) =>
        // no .distinct() on the semi-join's right side: semi-join
        // semantics already emit each left row at most once
        sig.select("gene")
          .join(geneExpr.select("gene"), Seq("gene"), "left_semi")
          .orderBy("gene").limit(n)
      case None =>
        geneExpr.groupBy("gene").agg(var_samp(col("value")).as("__var"))
          .orderBy(col("__var").desc_nulls_last, col("gene"))
          .limit(n).select("gene")
    }
  }

  /** J4: all-pairs Pearson correlation as a sample-key self-join feeding
    * the `corr` aggregate — the scale-friendly long form of
    * `expr_data.T.corr()` (`pipeline2.py:702-703`). The gene set is
    * restricted FIRST (cardinality reduction before the O(n²) operator is
    * a semantic plan step, SURVEY §4.1): pairs = top² / 2, each aggregated
    * from the sample vectors in one shuffle.
    *
    * Output: (g1, g2, corr) for g1 < g2; constant genes yield null corr
    * (pandas NaN) and fall out of the edge threshold naturally.
    */
  def correlations(geneExpr: DataFrame, top: DataFrame): DataFrame = {
    val e = geneExpr.join(broadcast(top.select("gene")), Seq("gene"))
    val a = e.select(col("gene").as("g1"), col("sample_id"), col("value").as("v1"))
    val b = e.select(col("gene").as("g2"), col("sample_id"), col("value").as("v2"))
    // The filtered side is bounded by construction (top-N genes × samples),
    // so broadcast it: sample_id has ~#samples distinct values and a
    // shuffled join would funnel the pair explosion through that narrow
    // key; the broadcast keeps the join map-side with no skew exposure.
    a.join(broadcast(b), Seq("sample_id"))
      .filter(col("g1") < col("g2"))                    // J5 upper triangle
      .groupBy("g1", "g2")
      .agg(corr(col("v1"), col("v2")).as("corr"))
  }

  /** G5: edge-induced subgraph on `nodes` (`pipeline2.py:1066`) — two
    * left-semi joins, one per endpoint. */
  def subgraph(edges: DataFrame, nodes: DataFrame): DataFrame =
    edges
      .join(nodes.select(col("gene").as("src")), Seq("src"), "left_semi")
      .join(nodes.select(col("gene").as("dst")), Seq("dst"), "left_semi")
      .select("src", "dst", "weight")

  /** G1: undirected weighted edges where |corr| > threshold
    * (`pipeline2.py:712-716`; weight = |corr|). */
  def edges(correlations: DataFrame, threshold: Double = 0.7): DataFrame =
    correlations
      .filter(abs(col("corr")) > threshold)
      .select(col("g1").as("src"), col("g2").as("dst"),
        abs(col("corr")).as("weight"))
}
