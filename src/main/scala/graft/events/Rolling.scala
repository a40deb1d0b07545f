package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing time-RANGE window aggregates (events-family extension):
  * per-key rolling statistics over a trailing window measured in TIME
  * units, not rows.
  *
  * The RANGE frame (`rangeBetween(-(width-1), 0)` on an integer time
  * axis) is the load-bearing choice vs a ROWS frame: with gaps in the
  * series, "last 7 days" and "last 7 rows" disagree, and a ROWS frame
  * silently stretches over the gap. Pre-aggregating to one row per
  * (key, time bucket) first keeps the window input minimal — the rolling
  * pass then slides over |keys| × |buckets| rows, not raw events.
  *
  * Plan: one hash aggregate (shuffle on (key, bucket)) + one window
  * (shuffle on key). Per-key windows parallelize across keys; at 100 TB
  * the pre-aggregation is what keeps the sort small.
  */
object Rolling {

  /** Per-(key, bucket) value plus its trailing average/sum/min/max over
    * the `width` most recent buckets (inclusive). `bucket` must be an
    * integer time axis (e.g. epoch days); `value` the pre-aggregated
    * per-bucket measure. Output keeps the input column names and adds
    * roll_avg / roll_sum / roll_min / roll_max / roll_n. */
  def trailing(df: DataFrame, key: String, bucket: String, value: String,
               width: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(bucket))
      .rangeBetween(-(width - 1), 0)
    df.withColumn("roll_avg", avg(col(value)).over(w))
      .withColumn("roll_sum", sum(col(value)).over(w))
      .withColumn("roll_min", min(col(value)).over(w))
      .withColumn("roll_max", max(col(value)).over(w))
      .withColumn("roll_n", count(col(value)).over(w))
  }
}
