package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto / contribution analysis over a pre-aggregated (keys, value)
  * table: each key's share of total, the cumulative share in descending
  * value order, and the "in the top `threshold` of mass" flag (80/20
  * reporting).
  *
  * Determinism across engines: the running sum cumulates INTEGER
  * fixed-point units (value × 10^scale, rounded), so cumulative shares
  * are ratios of exact integers — no float accumulation-order noise in
  * the ranking-critical column. The window runs over the pre-aggregated
  * key table (bounded by the key domain), the gate-sweep/BH-small-branch
  * trade; the fact table never sorts globally.
  *
  * The flag includes the row that CROSSES the threshold (cumulative mass
  * before this row < threshold), the usual Pareto-report convention.
  */
object Contribution {

  def pareto(df: DataFrame, keyCols: Seq[String], valueCol: String,
             threshold: Double = 0.8, scale: Int = 2): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    val mult = math.pow(10, scale)
    val units = round(col(valueCol) * mult).cast("long")
    val keyed = df.withColumn("__u", units)
    val order = (col("__u").desc +: keyCols.map(col(_).asc))
    val wCum = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    keyed
      .withColumn("__cum", sum(col("__u")).over(wCum))
      .withColumn("__tot", sum(col("__u")).over(wAll))
      .select(
        keyCols.map(col) :+
          col(valueCol) :+
          round(col("__u") / col("__tot").cast("double"), 4).as("share") :+
          round(col("__cum") / col("__tot").cast("double"), 4)
            .as("cum_share") :+
          ((col("__cum") - col("__u")).cast("double") <
            lit(threshold) * col("__tot")).as("in_top"): _*)
  }
}
