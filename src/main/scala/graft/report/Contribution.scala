package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Ranks

/** Pareto / contribution analysis over a pre-aggregated (keys, value)
  * table: each key's share of total, the cumulative share in descending
  * value order, and the "in the top `threshold` of mass" flag (80/20
  * reporting).
  *
  * Determinism across engines: the running sum cumulates INTEGER
  * fixed-point units (value × 10^scale, rounded), so cumulative shares
  * are ratios of exact integers — no float accumulation-order noise in
  * the ranking-critical column. The running sum is size-dispatched
  * ([[Ranks.globalRunningStats]]): a shared-sort window below 2M keys,
  * the distributed two-pass offset sweep above — the fact table never
  * sorts globally, and neither does a huge key domain.
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
    // one eager (n, total) probe replaces the whole-frame total window
    // and routes the running sum through the size-dispatched Ranks
    // two-pass form past 2M keys — no single-partition sort at scale
    val probe = keyed.agg(count(lit(1)), sum(col("__u"))).head()
    val n = probe.getLong(0)
    val tot = if (probe.isNullAt(1)) 0L else probe.getLong(1)
    Ranks.globalRunningStats(keyed, order, "__u", "__rk", "__cum", n)
      .withColumn("__tot", lit(tot))
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
