package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph summary statistics (X81): size, reciprocity, and degree
  * assortativity — the one-row health panel that says whether a graph
  * is hub-dominated (disassortative, r < 0) or peer-clustered
  * (assortative, r > 0), and how bidirectional its relationships are.
  *
  * Everything is exact-integer until the final Pearson ratio: degrees
  * are counts, the assortativity moments are sums of degree products
  * over the symmetrized edge list, and reciprocity is a set-membership
  * count — so the only float work is three closed-form divisions,
  * rounded. Scale shape: degree aggregate (edge-proportional), degrees
  * broadcast back onto edges (|V|-bounded build side), one 1-row
  * moment aggregate; the reciprocity probe is a self-semi-join on the
  * reversed key, co-partitioned.
  */
object GraphStats {

  /** One row over a DIRECTED multigraph edge list (src, dst) — self
    * loops excluded, parallel edges collapsed: (n_nodes, n_edges,
    * reciprocity 6-dp, assortativity 6-dp; assortativity null for
    * degenerate degree variance). Assortativity is computed on the
    * UNDIRECTED degree sequence (each collapsed undirected edge
    * contributes its endpoint-degree pair in both orientations — the
    * standard Newman r). */
  def summary(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("u"),
        col(dstCol).cast("string").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // undirected collapse
    val und = e.select(least(col("u"), col("v")).as("a"),
      greatest(col("u"), col("v")).as("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val recip = e.join(
        e.select(col("v").as("u"), col("u").as("v")),
        Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("__r"))
    // Newman r over endpoint-degree pairs (ji, ki), both orientations:
    // r = [Σjk/M − (Σ(j+k)/2M)²] / [Σ(j²+k²)/2M − (Σ(j+k)/2M)²]
    val pairs = und
      .join(deg.withColumnRenamed("x", "a").withColumnRenamed("d", "da"),
        Seq("a"))
      .join(deg.withColumnRenamed("x", "b").withColumnRenamed("d", "db"),
        Seq("b"))
    val mom = pairs.agg(
      count(lit(1)).as("m"),
      sum(col("da") * col("db")).as("sjk"),
      sum(col("da") + col("db")).as("sj"),
      sum(col("da") * col("da") + col("db") * col("db")).as("sj2"))
    val mD = col("m").cast("double")
    val mean = col("sj") / (lit(2.0) * mD)
    val num = col("sjk") / mD - mean * mean
    val den = col("sj2") / (lit(2.0) * mD) - mean * mean
    mom.crossJoin(broadcast(nodes)).crossJoin(broadcast(nEdges))
      .crossJoin(broadcast(recip))
      .select(col("n_nodes"), col("n_edges"),
        round(col("__r").cast("double") /
          nullif(col("n_edges"), lit(0L)), 6).as("reciprocity"),
        when(den > 0, round(num / den, 6)).as("assortativity"))
  }
}
