package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the last stage of entity resolution:
  * after blocking ([[Dedup.sortedNeighborhoodPairs]]) finds candidate
  * duplicate pairs and connected components
  * ([[Dedup.connectedComponents]]) closes them into clusters, ONE
  * record per cluster must be elected the survivor ("golden record")
  * by a deterministic rule.
  *
  * The whole pipeline is a composition of existing operators — the
  * point of this module is the composition contract, not new plumbing:
  * pair edges are candidate-proportional, the component labeling
  * size-dispatches (driver union-find under the threshold, large-star/
  * small-star above), and the election is one max-of-struct aggregate,
  * so no stage is quadratic in the corpus.
  *
  * Election rule: longest text wins (most information), ties broken by
  * MIN id (oldest record) — the (len DESC, id ASC) rule every MDM
  * survivorship default uses. Encoded as max of a (len, −id) struct so
  * it is a single map-side-combinable aggregate, not a window sort.
  *
  * Records in no candidate pair are their own cluster of one — absent
  * from the edge set, labeled by the left-join + coalesce, NOT dropped:
  * a golden-record table must cover the full corpus.
  */
object Survivorship {

  /** Cluster the corpus by sorted-neighborhood blocking + connected
    * components, then elect one golden record per cluster. Output:
    * (cluster = min id in cluster, golden_id, n_members BIGINT),
    * ordered by cluster. */
  def goldenRecords(df: DataFrame, id: String, text: String,
                    windowSize: Int = 3, minJaccard: Double = 0.5,
                    blockLen: Int = 2): DataFrame = {
    val pairs = Dedup.sortedNeighborhoodPairs(df, id, text,
      windowSize, minJaccard, blockLen)
    val comp = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")))
    val labeled = df
      .select(col(id).as("id"), length(col(text)).as("__len"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), col("__len"),
        coalesce(col("component"), col("id")).as("cluster"))
    labeled.groupBy(col("cluster"))
      .agg(
        max(struct(col("__len"), (-col("id")).as("__nid"),
          col("id").as("__gid"))).as("__m"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), col("__m.__gid").as("golden_id"),
        col("n_members"))
      .orderBy(col("cluster"))
  }
}
