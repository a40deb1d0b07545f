package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rate-anomaly detection over an event stream: flag time buckets whose
  * event volume departs from the recent trailing baseline — the ops
  * alert every telemetry pipeline runs ("errors spiked at 14:00").
  */
object Anomaly {

  /** Per-(type, hour) volume z-scored against the trailing `trailing`
    * OBSERVED hourly buckets of the same type (empty hours emit no
    * bucket and therefore don't enter the baseline — the documented
    * semantics; densify upstream if silence should count as zero).
    *
    * Scale shape: the event stream collapses to an (type, hour) count
    * aggregate FIRST (map-side combined; the window never sees event
    * grain), then one window pass partitioned by the type key over
    * bucket-cardinality rows — ~years of hours per type, thousands of
    * rows, never a scale concern. The z statistic is computed from the
    * 4-dp-rounded trailing mean/stddev so the flag boundary is
    * engine-independent; buckets with fewer than 2 trailing
    * observations have no defined baseline and flag false with null z.
    *
    * Output: (typeCol, bucket_ts, n, base_mean, base_sd, z, is_anomaly)
    * ordered by nothing — callers sort.
    */
  def hourlyRateAnomalies(events: DataFrame, typeCol: String,
                          tsCol: String, trailing: Int = 24,
                          cut: Double = 3.0): DataFrame = {
    require(trailing >= 2, "need at least 2 trailing buckets for a stddev")
    // null-instant complete-case (fuzz-37): a null bucket has no
    // position on the trailing-window axis
    val hourly = events.filter(col(tsCol).isNotNull)
      .groupBy(col(typeCol), date_trunc("hour", col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("bucket_ts"))
      .rowsBetween(-trailing, -1)
    val mu = round(avg(col("n")).over(w), 4)
    val sd = round(stddev_samp(col("n")).over(w), 4)
    val z = round((col("n") - col("base_mean")) / col("base_sd"), 4)
    hourly
      .withColumn("base_mean", mu)
      .withColumn("base_sd", sd)
      .withColumn("z",
        when(col("base_sd").isNotNull && col("base_sd") > 0, z))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > cut, lit(false)))
  }

  /** SEASONAL twin of [[hourlyRateAnomalies]]: each (type, hour) bucket
    * is z-scored against the profile of the SAME HOUR-OF-DAY across all
    * days — "is 3 AM today weird for 3 AM", where the trailing variant
    * asks "is this hour weird vs the last day". Diurnal load patterns
    * make the trailing baseline flag every morning ramp; the seasonal
    * profile is the fix every on-call alert grows eventually.
    *
    * Same scale shape: one (type, hour) count aggregate, then one
    * window over bucket-cardinality rows partitioned by (type,
    * hour-of-day). The profile is self-inclusive (the bucket
    * participates in its own baseline — with d days of history the
    * self-term biases z by ~1/d; exclude-self needs d ≥ 2 anyway).
    * Baselines with <2 observations or zero spread flag false, null z. */
  def seasonalRateAnomalies(events: DataFrame, typeCol: String,
                            tsCol: String, cut: Double = 3.0): DataFrame = {
    // null-instant complete-case (fuzz-37; see hourlyRateAnomalies)
    val hourly = events.filter(col(tsCol).isNotNull)
      .groupBy(col(typeCol), date_trunc("hour", col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hod", hour(col("bucket_ts")).cast("long"))
    val w = Window.partitionBy(col(typeCol), col("hod"))
    val z = round((col("n") - col("base_mean")) / col("base_sd"), 4)
    hourly
      .withColumn("base_mean", round(avg(col("n")).over(w), 4))
      .withColumn("base_sd", round(stddev_samp(col("n")).over(w), 4))
      .withColumn("z",
        when(col("base_sd").isNotNull && col("base_sd") > 0, z))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > cut, lit(false)))
  }

  /** Hampel filter per key — the robust sibling of the z-score
    * screens: a point is an outlier when it sits more than
    * nSigma · 1.4826 · MAD from the CENTERED rolling median, where
    * MAD_i = median_{j ∈ ±halfWindow}(|x_j − m_i|) is taken about the
    * center's OWN median (the faithful Hampel definition — stacking
    * two independent rolling medians, the common shortcut, is a
    * different and weaker filter). The window recomputation is a
    * per-key range self-join (|i − j| ≤ halfWindow): n·(2h+1) pair
    * rows over per-key AGGREGATE series (calendar-bounded, the
    * changepoint contract), never fact grain. Medians are exact
    * interpolated percentiles — cross-engine identical. Output:
    * (key, orderCol, value, roll_med 6dp, roll_mad 6dp, is_outlier). */
  def hampel(series: DataFrame, key: String, orderCol: String,
             value: String, halfWindow: Int,
             nSigma: Double = 3.0): DataFrame = {
    require(halfWindow >= 1, "halfWindow must be >= 1")
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val idx = series.select(col(key).as("__k"), col(orderCol).as("__t"),
        col(value).cast("double").as("__x"))
      .withColumn("__i", row_number().over(w))
    val nb = idx.select(col("__k"), col("__i").as("__j"),
      col("__x").as("__xj"))
    val pairs = idx.join(nb, Seq("__k"))
      .filter(abs(col("__i") - col("__j")) <= halfWindow)
    val med = pairs.groupBy(col("__k"), col("__i"))
      .agg(percentile(col("__xj"), lit(0.5)).as("__med"))
    val mad = pairs.join(med, Seq("__k", "__i"))
      .groupBy(col("__k"), col("__i"))
      .agg(percentile(abs(col("__xj") - col("__med")), lit(0.5))
        .as("__mad"))
    idx.join(med, Seq("__k", "__i")).join(mad, Seq("__k", "__i"))
      .select(col("__k").as(key), col("__t").as(orderCol),
        col("__x").as(value),
        round(col("__med"), 6).as("roll_med"),
        round(col("__mad"), 6).as("roll_mad"),
        (abs(col("__x") - col("__med")) >
          lit(nSigma * 1.4826) * col("__mad")).as("is_outlier"))
  }
}
