package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-changepoint mean-shift scan per key — the first step of binary
  * segmentation (Scott & Knott / CUSUM family): over an ordered series
  * x_1..x_n, every admissible split i is scored with the scaled
  * between-segment contrast
  *
  *   stat(i) = (mean(x_1..i) − mean(x_{i+1}..n))² · i·(n−i)/n
  *
  * (the squared CUSUM statistic — the i·(n−i)/n factor is the inverse
  * variance of the mean difference, so a shift near the edges needs a
  * larger contrast to win), and the argmax split is reported.
  *
  * Shape: prefix sums and totals are two window specs over the same
  * per-key sort (one Window operator after collapse); the argmax is a
  * row_number top-1 (WindowGroupLimit pushes it ahead of the shuffle).
  * Like [[graft.ml.TrendStats]], the scan runs over the per-key
  * AGGREGATE series — calendar-bounded, never fact grain.
  *
  * Exactness: with integer series the prefix sums are exact LONGs, so
  * both engines derive identical doubles; stat is rounded to 6 dp
  * before ranking so the argmax cannot flap across engines, and the
  * tie-break is the earliest split.
  */
object Changepoint {

  /** Best mean-shift split per key: (key, n BIGINT, split_at = orderCol
    * value of the LAST point of the left segment, stat 4-dp). Splits
    * leaving fewer than `minSeg` points on either side are not
    * considered; keys with n < 2·minSeg drop out. */
  def meanShiftScan(series: DataFrame, key: String, orderCol: String,
                    value: String, minSeg: Int = 3): DataFrame = {
    require(minSeg >= 1, "minSeg must be >= 1")
    val wOrd = Window.partitionBy(col(key)).orderBy(col(orderCol))
    val wAll = Window.partitionBy(col(key))
    val scored = series
      .select(col(key), col(orderCol), col(value).cast("long").as("__x"))
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__sl", sum(col("__x")).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col("__x")).over(wAll))
      .filter(col("__i") >= minSeg && col("__i") <= col("__n") - minSeg)
      .withColumn("__ml", col("__sl").cast("double") / col("__i"))
      .withColumn("__mr", (col("__s") - col("__sl")).cast("double") /
        (col("__n") - col("__i")))
      .withColumn("__stat", round(
        pow(col("__ml") - col("__mr"), 2) *
          (col("__i") * (col("__n") - col("__i"))).cast("double") /
          col("__n"), 6))
    val wBest = Window.partitionBy(col(key))
      .orderBy(col("__stat").desc, col(orderCol))
    scored
      .withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col(key), col("__n").as("n"), col(orderCol).as("split_at"),
        round(col("__stat"), 4).as("stat"))
  }

  /** Tabular CUSUM control chart (X82): the sequential drift detector —
    * S⁺ accumulates upward deviations past slack k, S⁻ downward;
    * crossing decision interval h raises an alarm and RESETS that side
    * (the standard restart-after-signal convention, stated because
    * implementations differ). A true recurrence, so it rides the X51
    * ordered-array fold with a struct accumulator
    * (sPos, sNeg, nAlarms, firstAlarmIdx); the oracle replays it as a
    * recursive CTE. Deterministic: the series is integer counts, and
    * mu0/k/h enter as the same runtime doubles on both engines.
    *
    * Output per key: (key, n BIGINT, s_pos 6-dp, s_neg 6-dp,
    * n_alarms BIGINT, first_alarm BIGINT nullable — 1-based index of
    * the first crossing). Scale contract as [[Ewma.ewmaLast]]:
    * calendar-bounded per-key payload, parallelism = keys. */
  def cusum(series: DataFrame, key: String, orderCol: String,
            value: String, mu0: Double, k: Double, h: Double): DataFrame = {
    require(h > 0, s"decision interval must be positive, got $h")
    val arr = array_sort(collect_list(struct(col(orderCol).as("t"),
      col(value).cast("double").as("x"))))
    val mu = lit(mu0); val kk = lit(k); val hh = lit(h)
    series.groupBy(col(key))
      .agg(count(lit(1)).as("n"), arr.as("__arr"))
      .withColumn("__fin",
        aggregate(col("__arr"),
          struct(lit(0.0).as("sp"), lit(0.0).as("sn"),
            lit(0L).as("na"), lit(null).cast("long").as("fa"),
            lit(0L).as("i")),
          (acc, e) => {
            val i = acc.getField("i") + 1
            val spRaw = greatest(lit(0.0),
              acc.getField("sp") + (e.getField("x") - mu - kk))
            val snRaw = greatest(lit(0.0),
              acc.getField("sn") + (mu - kk - e.getField("x")))
            val alarm = spRaw > hh || snRaw > hh
            struct(
              when(spRaw > hh, lit(0.0)).otherwise(spRaw).as("sp"),
              when(snRaw > hh, lit(0.0)).otherwise(snRaw).as("sn"),
              (acc.getField("na") +
                when(spRaw > hh, 1L).otherwise(0L) +
                when(snRaw > hh, 1L).otherwise(0L)).as("na"),
              coalesce(acc.getField("fa"),
                when(alarm, i)).as("fa"),
              i.as("i"))
          }))
      .select(col(key), col("n"),
        round(col("__fin").getField("sp"), 6).as("s_pos"),
        round(col("__fin").getField("sn"), 6).as("s_neg"),
        col("__fin").getField("na").as("n_alarms"),
        col("__fin").getField("fa").as("first_alarm"))
  }

  /** Page–Hinkley drift statistic per key (Page 1954; the standard
    * stream-drift test in online-learning monitors): with running mean
    * x̄_t over the prefix, PH_t = Σ_{i≤t} (x_i − x̄_i − δ) and the
    * reported statistic is max_t (PH_t − min_{s≤t} PH_s) — how far the
    * deviation sum has climbed off its historical floor; δ is the
    * magnitude tolerance. Unlike [[cusum]] this needs NO recurrence —
    * running mean, prefix sum and running min are all plain ordered
    * windows, so both engines evaluate the identical sequential float
    * chain. Output: (key, n BIGINT, ph_stat 4dp, detect_at = orderCol
    * of the first max, alarm = stat > lambda). Per-key payload is the
    * aggregate series (calendar-bounded), the cusum scale contract. */
  def pageHinkley(series: DataFrame, key: String, orderCol: String,
                  value: String, delta: Double,
                  lambda: Double): DataFrame = {
    val wOrd = Window.partitionBy(col(key)).orderBy(col(orderCol))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val x = col(value).cast("double")
    val scored = series
      .withColumn("__dev", x - avg(x).over(wCum) - lit(delta))
      .withColumn("__ph", sum(col("__dev")).over(wCum))
      .withColumn("__gap",
        round(col("__ph") - min(col("__ph")).over(wCum), 6))
    val wBest = Window.partitionBy(col(key))
      .orderBy(col("__gap").desc, col(orderCol))
    scored
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(key))))
      .withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col(key), col("__n").as("n"),
        round(col("__gap"), 4).as("ph_stat"),
        col(orderCol).as("detect_at"),
        (col("__gap") > lambda).as("alarm"))
  }
}
