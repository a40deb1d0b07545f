package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) snapshot build from a change log
  * (events-family extension): collapse consecutive runs of an equal
  * attribute value per key into validity intervals.
  *
  * Classic warehouse shape: the event stream is the change log; the
  * output is one row per (key, run) with `valid_from` = first event of
  * the run, `valid_to` = start of the next run (null while current), and
  * a per-key `version` sequence. Three window passes over the same
  * partition-by-key sort — Spark plans them as ONE sort + one exchange
  * (the window specs share partitioning and ordering), then a hash
  * aggregate on (key, version).
  *
  * Scale: per-key windows, same argument as [[Intervals]] — parallelism
  * is the key count; no join, no state beyond the sort.
  */
object Scd {

  /** (key, attr, version BIGINT, valid_from, valid_to, is_current) —
    * `key`/`attr`/`ts` keep their input names; `tieBreak` orders equal
    * timestamps deterministically. Null-safe on attr (a run of nulls is
    * a run). */
  def scd2(df: DataFrame, key: String, ts: String, attr: String,
           tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val byKey = Window.partitionBy(key).orderBy(order: _*)
    // Run break where attr differs (null-safely) from the previous row.
    // A key's first row is an explicit break: lag-null <=> null-attr would
    // otherwise read as "no change" and start that key's versions at 0.
    val flagged = df.withColumn("__brk",
      when(row_number().over(byKey) === 1, 1L)
        .when(lag(col(attr), 1).over(byKey) <=> col(attr), 0L)
        .otherwise(1L))
    val version = sum(col("__brk")).over(
      byKey.rowsBetween(Window.unboundedPreceding, 0))
    val runs = flagged.withColumn("version", version)
      .groupBy(col(key), col("version"), col(attr))
      .agg(min(col(ts)).as("valid_from"))
    val byVersion = Window.partitionBy(key).orderBy(col("version"))
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col(attr), col("version"), col("valid_from"),
        col("valid_to"), col("is_current"))
  }
}
