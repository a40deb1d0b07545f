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

  /** Spectral entropy per key — the forecastability screen: compute
    * the periodogram at every Fourier frequency j = 1..⌊n/2⌋ of the
    * demeaned series, normalize the powers to a distribution, and
    * read its Shannon entropy scaled by ln(⌊n/2⌋). Near 0 = one
    * dominant cycle (forecast it); near 1 = white noise (don't
    * bother). The full-spectrum generalization of [[periodogram]]'s
    * fixed-period probe.
    *
    * Scale shape: n·⌊n/2⌋ working rows per key (the DFT is quadratic
    * without FFT) — SERIES grain by contract (daily/hourly buckets,
    * thousands of points), distributed across (key, frequency)
    * groups, never a driver loop. Output: (key, n BIGINT,
    * n_freq BIGINT, entropy 4dp nats, norm_entropy 4dp);
    * single-point keys drop out, constant series or keys with fewer
    * than 2 frequencies (n < 4) yield nulls. */
  def spectralEntropy(series: DataFrame, key: String, bucket: String,
                      value: String): DataFrame = {
    val wOrd = Window.partitionBy(col(key)).orderBy(col(bucket))
    val wKey = Window.partitionBy(col(key))
    val v = col(value).cast("double")
    val indexed = series
      .withColumn("__t", (row_number().over(wOrd) - 1).cast("double"))
      .withColumn("__m", avg(v).over(wKey))
      .withColumn("__d", v - col("__m"))
      .withColumn("__n", count(lit(1)).over(wKey))
    val withJ = indexed
      // n = 1 has no Fourier frequency (sequence(1, 0) would COUNT
      // DOWN in Spark) — single-point keys drop out entirely
      .filter(col("__n") >= 2)
      .withColumn("__j", explode(sequence(lit(1L),
        floor(col("__n") / 2).cast("long"))))
    val theta = lit(2.0 * math.Pi) * col("__t") * col("__j") / col("__n")
    val perFreq = withJ.groupBy(col(key), col("__j"))
      .agg(max(col("__n")).as("__n"),
        (sum(col("__d") * cos(theta)) * sum(col("__d") * cos(theta)) +
          sum(col("__d") * sin(theta)) * sum(col("__d") * sin(theta)))
          .as("__p"))
    perFreq.groupBy(col(key))
      .agg(max(col("__n")).as("n"),
        count(lit(1)).as("n_freq"),
        sum(col("__p")).as("__tot"),
        sum(when(col("__p") > 0, col("__p") * log(col("__p"))))
          .as("__plp"))
      .select(col(key), col("n"), col("n_freq"),
        when(col("__tot") > 0 && col("n_freq") >= 2,
          round(log(col("__tot")) - col("__plp") / col("__tot"), 4))
          .as("entropy"),
        when(col("__tot") > 0 && col("n_freq") >= 2,
          round((log(col("__tot")) - col("__plp") / col("__tot")) /
            log(col("n_freq").cast("double")), 4))
          .as("norm_entropy"))
  }
}
