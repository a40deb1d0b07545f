package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-quality and mixing statistics for undirected simple
  * graphs: Newman modularity of a given community assignment and
  * degree assortativity. Both are exact-integer edge/degree aggregates
  * until the final division — no iteration, no driver collect; edges
  * shuffle once on their endpoint keys, degrees are
  * map-side-combinable. Community DETECTION feeds in from upstream
  * (connected components, label propagation); these score it —
  * modularity Q = Σ_c (e_c/m − (d_c/2m)²) (Newman & Girvan 2004).
  */
object Modularity {

  /** Canonicalize to undirected simple edges a < b (self-loops
    * dropped, duplicates collapsed). */
  private def canon(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Modularity of `communities` (node → community) over `edges`.
    * Output per community: (community, n_nodes, intra_edges,
    * degree_sum, q_contrib 6dp) plus the graph-wide q 6dp repeated on
    * every row (window total — community-bounded output). m counts all
    * edges; callers pass a total node→community assignment (nodes
    * missing from it simply contribute no intra-edges or degree mass).
    */
  def modularity(edges: DataFrame, src: String, dst: String,
                 communities: DataFrame, node: String,
                 community: String): DataFrame = {
    val e = canon(edges, src, dst)
    val m = e.count()
    require(m > 0, "modularity needs at least one edge")
    val cm = communities.select(col(node).as("__n"),
      col(community).as("__c"))
    val deg = e.select(col("a").as("__n"))
      .union(e.select(col("b").as("__n")))
      .groupBy(col("__n")).agg(count(lit(1)).as("__d"))
    val degC = deg.join(cm, Seq("__n"))
      .groupBy(col("__c"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("__d")).as("degree_sum"))
    val intra = e
      .join(cm.select(col("__n").as("a"), col("__c").as("__ca")), Seq("a"))
      .join(cm.select(col("__n").as("b"), col("__c").as("__cb")), Seq("b"))
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("__c"))
      .agg(count(lit(1)).as("intra_edges"))
    val md = lit(m.toDouble)
    val contrib = coalesce(col("intra_edges"), lit(0L)) / md -
      (col("degree_sum") / (lit(2.0) * md)) *
        (col("degree_sum") / (lit(2.0) * md))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    // q_total = the exact sum of the EMITTED 6-dp contributions, snapped
    // to integer millionths before the one division (round-15 audit:
    // rounding a float window-sum of irrational terms lets cross-engine
    // sum-order ulps flip the 6th decimal; summing the already-rounded
    // grid terms and snapping makes both engines' doubles identical by
    // construction, and keeps the invariant q_total == Σ q_contrib).
    degC.join(intra, Seq("__c"), "left")
      .select(col("__c").as(community), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"),
        round(contrib, 6).as("q_contrib"),
        (round(sum(round(contrib, 6)).over(w) * 1e6) / 1e6).as("q_total"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over the directed stub list (each undirected
    * edge contributes both orientations, making the formula
    * symmetric). All sums are exact integers. Output (one row):
    * n_edges, r 4dp (null for degree-regular graphs where the
    * variance vanishes).
    */
  def assortativity(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = canon(edges, src, dst)
    val deg = e.select(col("a").as("__n"))
      .union(e.select(col("b").as("__n")))
      .groupBy(col("__n")).agg(count(lit(1)).as("__d"))
    val stubs = e.select(col("a"), col("b"))
      .union(e.select(col("b").as("a"), col("a").as("b")))
    val j = stubs
      .join(deg.select(col("__n").as("a"), col("__d").as("__da")), Seq("a"))
      .join(deg.select(col("__n").as("b"), col("__d").as("__db")), Seq("b"))
    val agg = j.agg(count(lit(1)).as("__cnt"),
      sum(col("__da")).as("__sj"), sum(col("__db")).as("__sk"),
      sum(col("__da") * col("__db")).as("__sjk"),
      sum(col("__da") * col("__da")).as("__sjj"),
      sum(col("__db") * col("__db")).as("__skk"))
    val n = col("__cnt").cast("double")
    val num = col("__sjk") - col("__sj") * col("__sk") / n
    val den = sqrt((col("__sjj") - col("__sj") * col("__sj") / n) *
      (col("__skk") - col("__sk") * col("__sk") / n))
    agg.select((col("__cnt") / 2).cast("long").as("n_edges"),
      round(num / nullif(den, lit(0.0)), 4).as("r"))
  }
}
