package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pair-enumeration blowup guard (`maxPairsPerId`, round-12 task 4):
  * a g-way duplicate group owes C(g,2) pairs by the pair listers'
  * output contract — the sf10 run proved a correct query can ENOSPC
  * the machine. The guard caps each doc to its first k candidate
  * partners per side BEFORE the pair-proportional verification join,
  * bounding output (and verification cost) to 2·n·k while OR
  * semantics keep every duplicate group connected for transitive
  * closure. Planted here: a 1,000-way exact-duplicate group. */
class PairGuardSpec extends SparkSuite {
  import spark.implicits._

  // 1,000 exact copies of one document + a near-dup pair + distinct
  // filler; unguarded, the dup group owes C(1000,2) = 499,500 pairs.
  private val G = 1000
  private lazy val planted: DataFrame = {
    val dup = (1L to G.toLong).map(i =>
      (i, "the quick brown fox jumps over the lazy dog every day"))
    val rest = Seq(
      (2001L, "spark engines shuffle data across the cluster nodes"),
      (2002L, "spark engines shuffle data across the cluster racks"),
      (2003L, "completely unrelated text about marine biology reefs"))
    (dup ++ rest).toDF("doc_id", "text")
  }

  private def pairCount(df: DataFrame): Long = df.count()

  test("ngramJaccardPairs: unguarded emits the full clique; guarded " +
    "output is 2nk-bounded and every dup-group doc stays connected") {
    val k = 5
    val guarded = Dedup.ngramJaccardPairs(planted, "doc_id", "text",
      minJaccard = 0.5, maxPairsPerId = k)
    val n = pairCount(guarded)
    // bound: each of the 1,003 docs keeps <= k pairs per side
    assert(n <= 2L * 1003 * k, s"guarded pair count $n exceeds 2nk")
    assert(n >= G - 1, s"guarded pair count $n lost group connectivity")
    // OR semantics keep the group connected: transitive closure over
    // surviving pairs must put all 1,000 dup docs in one component
    val comp = Dedup.connectedComponents(
      guarded.select("id_a", "id_b"))
    val dupComponents = comp.filter(col("id") <= G)
      .select("component").distinct().count()
    assert(dupComponents == 1L,
      s"dup group split into $dupComponents components under the cap")
    // all surviving dup-group pairs are exact dups: jaccard = 1.0
    val bad = guarded.filter(col("id_a") <= G && col("id_b") <= G &&
      col("jaccard") =!= 1.0).count()
    assert(bad == 0L)
  }

  test("ngramJaccardPairs: a cap wider than the corpus reproduces the " +
    "unguarded answer exactly (guard-off parity on a small corpus)") {
    val small = planted.filter(col("doc_id") > 990L) // 10 dups + 3 rest
    val free = Dedup.ngramJaccardPairs(small, "doc_id", "text",
      minJaccard = 0.5)
    // width 15 >= every posting list (13 docs), so the lead-banding
    // loses nothing and the per-id cap never fires — guarded == free
    val capped = Dedup.ngramJaccardPairs(small, "doc_id", "text",
      minJaccard = 0.5, maxPairsPerId = 15)
    assert(free.except(capped).count() == 0L &&
      capped.except(free).count() == 0L)
  }

  test("minhashLshPairs: guarded run over the planted group completes " +
    "with bounded output and one connected component") {
    val k = 5
    val guarded = Dedup.minhashLshPairs(planted, "doc_id", "text",
      minJaccard = 0.5, maxPairsPerId = k)
    val n = pairCount(guarded)
    assert(n <= 2L * 1003 * k, s"guarded pair count $n exceeds 2nk")
    assert(n >= G - 1)
    val comp = Dedup.connectedComponents(guarded.select("id_a", "id_b"))
    assert(comp.filter(col("id") <= G)
      .select("component").distinct().count() == 1L)
  }

  test("containmentPairs: guarded run completes; pairs are exact " +
    "containment 1.0 within the dup group") {
    val k = 5
    // the dup group's shingles have df = 1000 > default maxShingleDf —
    // raise it so candidates exist, which is exactly the configuration
    // that would blow up unguarded
    val guarded = Dedup.containmentPairs(planted, "doc_id", "text",
      minContainment = 0.8, maxShingleDf = 2000L, maxPairsPerId = k)
    val n = pairCount(guarded)
    assert(n <= 2L * 1003 * k, s"guarded pair count $n exceeds 2nk")
    assert(n >= G - 1)
    val bad = guarded.filter(col("id_a") <= G && col("id_b") <= G &&
      (col("cont_a") =!= 1.0 || col("cont_b") =!= 1.0)).count()
    assert(bad == 0L)
  }

  test("minhashClusters: the cap preserves cluster labels — all 1,000 " +
    "dup docs share one cluster with the min-id representative") {
    val clusters = Dedup.minhashClusters(planted, "doc_id", "text",
      minJaccard = 0.5, maxPairsPerId = 5)
    val dupClusters = clusters.filter(col("id") <= G)
      .select("cluster").distinct().collect().map(_.getLong(0))
    assert(dupClusters.toSeq == Seq(1L))
    val rep = clusters.filter(col("id") <= G &&
      col("is_representative")).select("id").as[Long].collect()
    assert(rep.toSeq == Seq(1L))
    assert(clusters.filter(col("id") <= G)
      .select("cluster_size").distinct().as[Long].collect()
      .toSeq == Seq(G.toLong))
  }

  test("guard determinism: two guarded runs produce identical pair sets") {
    val a = Dedup.ngramJaccardPairs(planted, "doc_id", "text",
      minJaccard = 0.5, maxPairsPerId = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Dedup.ngramJaccardPairs(
        planted.repartition(7), "doc_id", "text",
        minJaccard = 0.5, maxPairsPerId = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq == b.toSeq)
  }
}
