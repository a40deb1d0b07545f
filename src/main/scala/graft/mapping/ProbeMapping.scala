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
    * of the reference's csv loader (`pipeline2.py:98-119`).
    *
    * "Last" is pinned to the explicit order key (file name asc, line
    * number within file): each file is read whole (`wholetext`) and line
    * numbers assigned with posexplode, because a plain csv read would
    * inherit Spark's size-bin-packed split order — listing- and
    * split-dependent, so "last occurrence" across multiple files (or even
    * across splits of one large file) would be nondeterministic. The
    * mapping is dimension-sized by construction (54k rows at reference
    * scale — always the broadcast side), so one row per file is bounded.
    * Column layout is the reference's fixed PROBEID,SYMBOL; line 0 of
    * each file is its header. */
  def loadMappingCsv(spark: SparkSession, path: String): DataFrame = {
    val rowSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "PROBEID STRING, SYMBOL STRING")
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("__file"),
        posexplode(split(col("value"), "\r?\n")).as(Seq("__line_no", "__line")))
      .filter(col("__line_no") > 0 && trim(col("__line")) =!= "")
      .select(col("__file"), col("__line_no"),
        from_csv(col("__line"), rowSchema, Map.empty[String, String]).as("r"))
      .select(col("__file"), col("__line_no"),
        col("r.PROBEID").as("probe_id"), col("r.SYMBOL").as("symbol"))
      .filter(col("symbol").isNotNull && col("symbol") =!= "" &&
        col("symbol") =!= "NA")
      .groupBy("probe_id")
      .agg(max_by(col("symbol"),
        struct(col("__file"), col("__line_no"))).as("symbol"))
  }

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
