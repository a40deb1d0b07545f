package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-key skew diagnostics: the measurement that decides between a
  * plain shuffle, AQE skew handling, and [[SkewJoin.saltedJoin]] at
  * 100 TB. One map-side-combinable groupBy(key).count() builds the
  * per-key table; every reported statistic is then an aggregate over
  * key-count rows (cardinality-sized, not data-sized).
  */
object SkewStats {

  /** One-row skew report for a join/agg key:
    *   - n_keys, n_rows
    *   - max_rows_per_key, avg (4 dp), skew_ratio = max/avg (4 dp) — the
    *     straggler factor a plain shuffle would suffer
    *   - p99_rows_per_key (4 dp, exact interpolated; switch to
    *     approx_percentile for ultra-high-cardinality keys)
    *   - hot_key: the LARGEST key string attaining max_rows_per_key
    *     (struct-max in one aggregate pass — deterministic under ties,
    *     engine-independent: lexicographic (cnt, key) order)
    */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val perKey = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_rows_per_key"),
      round(avg(col("cnt")), 4).as("avg_rows_per_key"),
      round(max(col("cnt")).cast("double") /
        (sum(col("cnt")).cast("double") / count(lit(1)).cast("double")), 4)
        .as("skew_ratio"),
      round(percentile(col("cnt"), lit(0.99)), 4).as("p99_rows_per_key"),
      max(struct(col("cnt"), col("key"))).getField("key").as("hot_key"))
  }
}
