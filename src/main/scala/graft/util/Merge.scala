package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert semantics as a batch operator (X87): apply a source
  * (changes) table onto a target — matched keys take the source's
  * values, unmatched target rows survive, unmatched source rows
  * insert; an optional source-side delete flag drops the key. The
  * lakehouse MERGE INTO statement re-expressed as a single
  * co-partitioned full-outer join, which is exactly how table formats
  * execute it under the hood.
  *
  * Scale shape: ONE full-outer join on the key columns — both sides
  * hash-partition on the same key, no broadcast assumption (the source
  * is often fact-sized in backfills). Column reconciliation is
  * per-column coalesce (source wins), evaluated map-side after the
  * join. Keys must be unique per side (upsert semantics are undefined
  * otherwise — enforced by the caller, the usual MERGE cardinality
  * contract).
  */
object Merge {

  /** Upsert `source` onto `target` (same schema). If `deleteFlagCol`
    * is set (a boolean column on the source), flagged keys are deleted
    * instead of upserted. Output has the target schema. */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
                deleteFlagCol: Option[String] = None): DataFrame = {
    val dataCols = target.columns.filterNot(keys.contains)
    val t = dataCols.foldLeft(target) { (d, c) =>
      d.withColumnRenamed(c, s"__t_$c") }
    val srcCols = keys ++ dataCols ++ deleteFlagCol.toSeq
    val s0 = source.select(srcCols.map(col): _*)
    val s = dataCols.foldLeft(s0) { (d, c) =>
      d.withColumnRenamed(c, s"__s_$c") }
      .withColumn("__in_src", lit(true))
    val joined = t.join(s, keys, "full_outer")
    val kept = deleteFlagCol match {
      case Some(f) => joined.filter(coalesce(col("__in_src"), lit(false))
        === false || !coalesce(col(f), lit(false)))
      case None => joined
    }
    // Matched rows take the source value UNCONDITIONALLY (a source
    // null is an intentional update-to-null, which a naive per-column
    // coalesce would silently revert).
    kept.select(keys.map(col) ++ dataCols.map(c =>
      when(coalesce(col("__in_src"), lit(false)), col(s"__s_$c"))
        .otherwise(col(s"__t_$c")).as(c)): _*)
  }
}
