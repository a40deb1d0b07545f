package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table plumbing (X89): pre-shuffle a fact table ONCE into
  * hash buckets on its join key so every later equi-join or aggregate
  * on that key runs exchange-free — the warehouse answer to "we join
  * on this key every night". At 100 TB this converts the recurring
  * dominant shuffle of a pipeline into a one-time layout cost, the
  * same trade Z-ordering makes for scan pruning.
  *
  * Uses the built-in Hive-compatible bucketing of `DataFrameWriter
  * .bucketBy` + `saveAsTable` (files carry the bucket id; the reader
  * reports a `HashPartitioning` output so Catalyst's
  * EnsureRequirements inserts NO Exchange). Both sides must agree on
  * bucket count and key; `spark.sql.sources.bucketing.enabled` is on
  * by default. BucketingSpec pins the exchange-free plan — the
  * feature IS the plan shape, so the test asserts on the physical
  * plan, not row values.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (overwrite), bucketed and
    * sorted by `keys` into `nBuckets` buckets. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    nBuckets: Int): Unit = {
    require(keys.nonEmpty && nBuckets > 0)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** True iff the physical plan of `df` contains a shuffle exchange —
    * the assertion primitive for exchange-free bucketed joins. */
  def hasShuffleExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
