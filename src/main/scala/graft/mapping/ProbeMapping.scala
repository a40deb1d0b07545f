package graft.mapping

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe -> gene-symbol mapping (S4/S5, J1, F3, A5).
  *
  * The reference's Python->R->CSV round trip (`pipeline2.py:53-137`,
  * `generate_probe_mappings_csv.r`) collapses to: load the mapping table,
  * broadcast-hash-join it into the long expression frame (inner join ==
  * left-outer-with-UNKNOWN_-default + anti-filter, `pipeline2.py:515-520`),
  * and collapse probes to genes with a per-(gene, sample) median
  * (`pipeline2.py:523-528`). The mapping is dimension-sized (54k rows at
  * reference scale) — always the broadcast side.
  */
object ProbeMapping {

  /** S5: read a PROBEID,SYMBOL csv; drop blank/NA symbols
    * (`generate_probe_mappings_csv.r:129`, `pipeline2.py:107-108`).
    * Duplicate PROBEIDs keep the last occurrence — dict-insertion semantics
    * of the reference's csv loader (`pipeline2.py:98-119`), pinned with an
    * explicit file-order max_by instead of relying on partition order. */
  def loadMappingCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(col("PROBEID").as("probe_id"), col("SYMBOL").as("symbol"))
      .filter(col("symbol").isNotNull && col("symbol") =!= "" &&
        col("symbol") =!= "NA")
      .withColumn("__ord", monotonically_increasing_id())
      .groupBy("probe_id")
      .agg(max_by(col("symbol"), col("__ord")).as("symbol"))

  /** J1 + F3 + A5: inner broadcast join then per-(gene, sample) median.
    * Output: (gene, sample_id, value). */
  def collapseToGenes(expr: DataFrame, mapping: DataFrame): DataFrame =
    expr
      .join(broadcast(mapping.select("probe_id", "symbol")), Seq("probe_id"))
      .groupBy(col("symbol").as("gene"), col("sample_id"))
      .agg(median(col("value")).as("value"))

  /** Mapping rate diagnostic (the reference logs 81.6% on GSE46602). */
  def mappingStats(expr: DataFrame, mapping: DataFrame): (Long, Long) = {
    val probes = expr.select("probe_id").distinct()
    val mapped = probes.join(broadcast(mapping), Seq("probe_id"), "left_semi")
    (probes.count(), mapped.count())
  }
}
