package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Seeded/attenuated spectral walks: personalized PageRank (random
  * walk with restart) and Katz centrality. Both are fixed-iteration
  * DataFrame loops in the [[Centrality.pageRankDistributed]]
  * discipline — edges stay partitioned, each round is one
  * degree-weighted join + aggregate plus (for PPR) a 1-row dangling
  * broadcast, `localCheckpoint` pins lineage. No driver copy of the
  * graph at any size.
  */
object Walks {

  /** Personalized PageRank with restart to a single seed:
    * x'(v) = (1−d)·[v = seed] + d·(Σ_{u→v} x(u)/outdeg(u) +
    * dangling·[v = seed]) — dangling mass restarts at the seed, the
    * standard RWR convention. `nodes` has column `node`; `edges`
    * (src, dst) are directed (symmetrize upstream for undirected
    * semantics). Output: (node, ppr 6dp).
    */
  def personalizedPageRank(spark: SparkSession, nodes: DataFrame,
                           edges: DataFrame, seed: Long,
                           damping: Double = 0.85,
                           iters: Int = 20): DataFrame = {
    val v = nodes.select(col("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e = edges.select(col("src"), col("dst"))
      .join(v.select(col("node").as("src")), Seq("src"))
      .join(v.select(col("node").as("dst")), Seq("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var x = v.withColumn("x",
      when(col("node") === seed, 1.0).otherwise(0.0)).localCheckpoint()
    var i = 0
    while (i < iters) {
      val withDeg = x.join(deg, x("node") === deg("src"), "left")
      val dangling = withDeg.filter(col("__deg").isNull)
        .agg(coalesce(sum(col("x")), lit(0.0)).as("__dang"))
      val contrib = withDeg.filter(col("__deg").isNotNull)
        .select(col("node").as("src"), (col("x") / col("__deg")).as("__c"))
        .join(e, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__c")).as("__in"))
      x = v.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(damping) * (coalesce(col("__in"), lit(0.0)) +
            when(col("node") === seed, col("__dang")).otherwise(0.0)) +
            when(col("node") === seed, lit(1.0 - damping))
              .otherwise(lit(0.0))).as("x"))
        .localCheckpoint()
      i += 1
    }
    val out = x.select(col("node"), round(col("x"), 6).as("ppr"))
      .localCheckpoint()
    v.unpersist(false); e.unpersist(false); deg.unpersist(false)
    out
  }

  /** Katz centrality by fixed-point iteration:
    * x'(v) = β + α·Σ_{u→v} x(u), x₀ = β·1 — counts walks of every
    * length into v, geometrically attenuated by α (α must be below
    * 1/λ_max for the series to converge; callers pick it per graph).
    * No degree normalization and no dangling term — that's the
    * defining contrast with PageRank. Output: (node, katz 6dp).
    */
  def katz(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
           alpha: Double, beta: Double = 1.0, iters: Int = 10): DataFrame = {
    val v = nodes.select(col("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e = edges.select(col("src"), col("dst"))
      .join(v.select(col("node").as("src")), Seq("src"))
      .join(v.select(col("node").as("dst")), Seq("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var x = v.withColumn("x", lit(beta)).localCheckpoint()
    var i = 0
    while (i < iters) {
      val contrib = x.select(col("node").as("src"), col("x"))
        .join(e, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("x")).as("__in"))
      x = v.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(beta) + lit(alpha) * coalesce(col("__in"), lit(0.0)))
            .as("x"))
        .localCheckpoint()
      i += 1
    }
    val out = x.select(col("node"), round(col("x"), 6).as("katz"))
      .localCheckpoint()
    v.unpersist(false); e.unpersist(false)
    out
  }
}
