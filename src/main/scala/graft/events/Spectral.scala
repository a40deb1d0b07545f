package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Discrete-frequency spectral probes: the periodogram power of a
  * bucketed series at caller-chosen candidate periods (weekly?
  * monthly? — the "which seasonality do I pass to Holt–Winters/STL"
  * question answered from data). Not an FFT: at a handful of named
  * periods the direct O(n·|periods|) projection is one
  * map-side-combinable aggregate per (key, period) and needs no
  * power-of-two length or global re-indexing beyond a per-key
  * position window.
  */
object Spectral {

  /** Power at each period P: with t the 0-based per-key position and
    * x̄ the key mean, A = Σ(x−x̄)·cos(2πt/P), B = Σ(x−x̄)·sin(2πt/P),
    * power = (A² + B²)·2/n (the standard periodogram normalization).
    * power_share is the regression R² of the (cos, sin) pair:
    * (A²/Σcos²θ + B²/Σsin²θ) / Σ(x−x̄)² — exactly 1 for a pure
    * sinusoid at P; a degenerate basis column (Σsin²θ = 0 at the
    * Nyquist period) contributes 0, matching its zero coefficient;
    * approximate (can slightly exceed 1) when P does not divide n, as
    * the basis is then not exactly orthogonal to the mean. Null share
    * for constant series. Output per (key, period): (key, period, n,
    * power 4dp, power_share 4dp).
    */
  def periodogram(series: DataFrame, key: String, bucket: String,
                  value: String, periods: Seq[Int]): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2),
      "periods must be >= 2")
    val wOrd = Window.partitionBy(col(key)).orderBy(col(bucket))
    val wKey = Window.partitionBy(col(key))
    val v = col(value).cast("double")
    val indexed = series
      .withColumn("__t", (row_number().over(wOrd) - 1).cast("double"))
      .withColumn("__m", avg(v).over(wKey))
      .withColumn("__d", v - col("__m"))
    val withP = indexed.crossJoin(
      broadcast(series.sparkSession.createDataFrame(
        periods.map(Tuple1(_))).toDF("period")))
    val theta = lit(2.0 * math.Pi) * col("__t") / col("period")
    withP.groupBy(col(key), col("period"))
      .agg(count(lit(1)).as("n"),
        sum(col("__d") * cos(theta)).as("__a"),
        sum(col("__d") * sin(theta)).as("__b"),
        sum(cos(theta) * cos(theta)).as("__cc"),
        sum(sin(theta) * sin(theta)).as("__sn"),
        sum(col("__d") * col("__d")).as("__ss"))
      .select(col(key), col("period"), col("n"),
        round((col("__a") * col("__a") + col("__b") * col("__b")) *
          lit(2.0) / col("n"), 4).as("power"),
        round((when(col("__cc") > 0,
            col("__a") * col("__a") / col("__cc")).otherwise(0.0) +
          when(col("__sn") > 0,
            col("__b") * col("__b") / col("__sn")).otherwise(0.0)) /
          nullif(col("__ss"), lit(0.0)), 4).as("power_share"))
  }
}
