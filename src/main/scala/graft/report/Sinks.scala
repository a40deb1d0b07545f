package graft.report

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output sinks (S8–S11, `pipeline2.py` CSV/GEXF/summary writers).
  *
  * CSV sinks coalesce to one file to match the reference's single-file
  * contract — acceptable because every sink in this pipeline is
  * aggregate-sized (metadata, DE results, centralities); the raw fact data
  * never flows through a sink. Wide pivots happen only here, at the edge:
  * internal representation stays long.
  */
object Sinks {

  /** Single-file header CSV (S8). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Long -> wide pivot for matrix-shaped sinks (normalized / gene-mapped /
    * correlation csv). Column order = `colOrder` (source sample order). */
  def pivotWide(long: DataFrame, keyCol: String, colCol: String,
                valCol: String, colOrder: Seq[String]): DataFrame =
    long.groupBy(col(keyCol))
      .pivot(colCol, colOrder)
      .agg(first(col(valCol)))
      .orderBy(col(keyCol))

  /** S9: GEXF sink, same shape as nx.write_gexf for an undirected weighted
    * graph. Driver-side string render — the network is dimension-bounded
    * (top-N genes) by construction. */
  def writeGexf(nodes: Seq[String], edges: Seq[(String, String, Double)],
                path: String): Unit = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    val idOf = nodes.zipWithIndex.toMap
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="utf-8"?>"""
    sb ++= "\n<gexf xmlns=\"http://www.gexf.net/1.2draft\" version=\"1.2\">\n"
    sb ++= "  <graph defaultedgetype=\"undirected\" mode=\"static\">\n"
    sb ++= "    <nodes>\n"
    nodes.foreach { n =>
      sb ++= s"""      <node id="${idOf(n)}" label="${esc(n)}" />\n"""
    }
    sb ++= "    </nodes>\n    <edges>\n"
    edges.zipWithIndex.foreach { case ((s, t, w), i) =>
      (idOf.get(s), idOf.get(t)) match {
        case (Some(si), Some(ti)) =>
          sb ++= s"""      <edge source="$si" target="$ti" id="$i" weight="$w" />\n"""
        case _ => ()
      }
    }
    sb ++= "    </edges>\n  </graph>\n</gexf>\n"
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), sb.toString)
  }

  /** S10 (volcano *data* — the relational content behind the figure):
    * (gene, log2FC, neg_log10_adj_p, significant). numpy/pandas parity:
    * -log10(0) = +Infinity (not null), NaN-comparison flags = false (not
    * null); the significance predicate is the SHARED
    * [[graft.de.DifferentialExpression.isSignificant]] column. */
  def volcanoData(results: DataFrame, pThreshold: Double = 0.05,
                  fcThreshold: Double = 1.0): DataFrame =
    results.select(
      col("gene"), col("log2FC"),
      when(col("adjusted_pvalue") === 0.0, lit(Double.PositiveInfinity))
        .otherwise(-log(10.0, col("adjusted_pvalue"))).as("neg_log10_adj_p"),
      graft.de.DifferentialExpression.isSignificant(
        col("adjusted_pvalue"), col("log2FC"), pThreshold, fcThreshold)
        .as("significant"))

  /** S10 network-viz *data* (`pipeline2.py:1059-1094`): top-N nodes by
    * composite score with PLACEHOLDER rows dropped (F10,
    * `pipeline2.py:1062-1063`), node size = composite score (J6 lookup),
    * plus the induced subgraph's edges (G5). */
  def networkVizData(targetScores: DataFrame, edges: DataFrame,
                     topN: Int = 30): (DataFrame, DataFrame) = {
    val top = targetScores.filter(col("gene") =!= "PLACEHOLDER")
      .orderBy(col("composite_score").desc, col("gene")).limit(topN)
      .select(col("gene"), col("composite_score").as("node_size"))
    val sub = graft.net.CoExpressionNetwork.subgraph(edges, top.select("gene"))
    (top, sub)
  }

  /** S10 barplot *data* (`pipeline2.py:1096-1114`): top-N targets by
    * composite score, placeholders dropped (F10). */
  def barplotData(targetScores: DataFrame, topN: Int = 20): DataFrame =
    targetScores.filter(col("gene") =!= "PLACEHOLDER")
      .orderBy(col("composite_score").desc, col("gene")).limit(topN)
      .select("gene", "composite_score")

  /** S11: the summary.txt contract (`pipeline2.py:1118-1146`). */
  def summaryReport(nSamples: Long, nCase: Long, nControl: Long,
                    nProbes: Long, nGenes: Long, nSignificant: Long,
                    nUp: Long, nDown: Long, nNodes: Long, nEdges: Long,
                    topTargets: Seq[(String, Double)], path: String): Unit = {
    val sb = new StringBuilder
    sb ++= "=== Drug Target Discovery Pipeline Summary ===\n\n"
    sb ++= "Dataset:\n"
    sb ++= s"  Samples: $nSamples ($nCase case / $nControl control)\n"
    sb ++= s"  Probes: $nProbes\n"
    sb ++= s"  Genes after mapping: $nGenes\n\n"
    sb ++= "Differential expression:\n"
    sb ++= s"  Significant genes: $nSignificant\n"
    sb ++= s"  Up-regulated: $nUp\n"
    sb ++= s"  Down-regulated: $nDown\n\n"
    sb ++= "Network:\n"
    sb ++= s"  Nodes: $nNodes\n"
    sb ++= s"  Edges: $nEdges\n\n"
    sb ++= "Top targets (composite score):\n"
    topTargets.foreach { case (g, s) => sb ++= f"  $g: $s%.4f\n" }
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), sb.toString)
  }
}
