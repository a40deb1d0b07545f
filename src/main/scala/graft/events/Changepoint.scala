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
}
