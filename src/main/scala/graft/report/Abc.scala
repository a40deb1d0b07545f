package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Ranks

/** ABC (Pareto) inventory classification: rank entities by value
  * contribution, classify by cumulative share — A carries the first
  * 80% of value, B the next 15%, C the tail. The class boundary test
  * runs in EXACT integer arithmetic (cum·100 ≤ pct·total on integer
  * value units), so no float-boundary flapping can move an entity
  * between classes across engines — the q131 integer-axis discipline.
  */
object Abc {

  /** `valueCents` must be an integer value column (cents — callers
    * aggregate with the round(sum(x)*100)::long convention). Ranking
    * is (value desc, key asc), fully deterministic. Output per key:
    * (key, value_cents, rank, cum_share 4dp, abc_class).
    */
  def classify(df: DataFrame, key: String, valueCents: String,
               aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(0 < aPct && aPct < bPct && bPct <= 100, "0 < aPct < bPct <= 100")
    // One eager probe ((n, total) in a single map-side-combined agg)
    // buys out BOTH former global windows: the running value sum joins
    // the size-dispatched rank sweep (Ranks two-pass form past 2M
    // entities — no single-partition sort at catalog scale), and the
    // total becomes a literal instead of a whole-frame window.
    val slim = df.select(col(key), col(valueCents).cast("long")
      .as(valueCents))
    val probe = slim.agg(count(lit(1)), sum(col(valueCents))).head()
    val n = probe.getLong(0)
    val tot = if (probe.isNullAt(1)) 0L else probe.getLong(1)
    Ranks.globalRunningStats(slim,
        Seq(col(valueCents).desc, col(key).asc), valueCents,
        "rank", "__cum", n)
      .select(col(key), col(valueCents), col("rank"),
        round(col("__cum").cast("double") / lit(tot), 4)
          .as("cum_share"),
        when(col("__cum") * 100 <= lit(tot) * aPct, "A")
          .when(col("__cum") * 100 <= lit(tot) * bPct, "B")
          .otherwise("C").as("abc_class"))
  }

  /** ABC × XYZ: value classification ([[classify]]) crossed with
    * demand-variability classes from the coefficient of variation of
    * per-bucket demand — X (cv < xCut: steady, forecastable),
    * Y (< yCut), Z (≥ yCut or undefined: erratic). The planning matrix
    * behind inventory policy (A-X items get tight service levels, C-Z
    * get make-to-order). Inputs are fact rows (key, bucketCol,
    * qtyCol, valueCents); per-key total value feeds ABC, per-bucket
    * demand sums feed the cv. Output per key: (key, total_cents
    * BIGINT, abc_class, n_buckets BIGINT, mean_demand 4dp, cv 4dp
    * nullable, xyz_class, class = concat). */
  def abcXyz(df: DataFrame, key: String, bucketCol: String,
             qtyCol: String, valueCents: String,
             xCut: Double = 0.5, yCut: Double = 1.0,
             aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(0 < xCut && xCut < yCut, "0 < xCut < yCut")
    val perBucket = df.groupBy(col(key), col(bucketCol))
      .agg(sum(col(qtyCol)).as("__q"), sum(col(valueCents)).as("__v"))
    val perKey = perBucket.groupBy(col(key))
      .agg(sum(col("__v")).as("total_cents"),
        count(lit(1)).as("n_buckets"),
        avg(col("__q")).as("__mq"),
        stddev_samp(col("__q").cast("double")).as("__sq"))
    val cv = col("__sq") / nullif(col("__mq"), lit(0.0))
    val abc = classify(perKey, key, "total_cents", aPct, bPct)
      .select(col(key), col("abc_class"))
    perKey.join(abc, Seq(key))
      .select(col(key), col("total_cents"), col("abc_class"),
        col("n_buckets"),
        round(col("__mq"), 4).as("mean_demand"),
        round(cv, 4).as("cv"),
        when(cv.isNull, "Z").when(cv < xCut, "X")
          .when(cv < yCut, "Y").otherwise("Z").as("xyz_class"))
      .withColumn("class",
        concat(col("abc_class"), lit("-"), col("xyz_class")))
  }
}
