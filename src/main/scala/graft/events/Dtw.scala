package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic time warping — the classic elastic-alignment distance
  * (Sakoe & Chiba 1978): unlike pointwise metrics (rolling
  * correlation, MASE), DTW matches series that run the same SHAPE at
  * shifted or stretched phase, the question "which activity series
  * behave like this one, allowing lag" that every seasonality-aware
  * comparison needs.
  *
  * Execution shape: the full O(n·m) DP runs INSIDE one row via nested
  * higher-order `aggregate` folds — the outer fold walks the query
  * series carrying the previous DP row as an array-typed accumulator,
  * the inner fold builds the next row left-to-right (the sequential
  * D[i][j−1] dependence no window or join expresses). Keys are
  * independent rows, so a million series parallelize trivially; the
  * per-key payload is the calendar-bounded bucket series (the Ewma
  * contract) and `maxLen` hard-caps the quadratic per-row cost —
  * longer series yield null, never a hidden blow-up.
  *
  * Every DP cell is |aᵢ−bⱼ| + least(three prior cells) evaluated in a
  * fixed order, so two engines replaying the recurrence produce
  * BIT-IDENTICAL doubles (no reordered float sums anywhere — stronger
  * than the usual rounding discipline; the 6-dp output round is
  * display only).
  */
object Dtw {

  /** DTW distance from every key's series to the `refKey` series,
    * |·| local cost, no band constraint. Series are the `orderCol`-
    * sorted `value` arrays per key (null values dropped; `orderCol`
    * ties broken by value — the Ewma sort contract). Keys longer than
    * `maxLen` (and the reference, required ≤ `maxLen`) yield null
    * distances with their length still reported. If `refKey` has no
    * rows the output is empty (inner cross join — stated).
    *
    * Output: (key, n BIGINT, m BIGINT, dtw 6dp,
    * dtw_norm 6dp = dtw/(n+m) — the standard path-length-proxy
    * normalization, stated as n+m, not the realized path length).
    * The refKey row itself appears with dtw = 0 (self-alignment). */
  def dtwToReference(series: DataFrame, key: String, orderCol: String,
                     value: String, refKey: String,
                     maxLen: Int = 128): DataFrame = {
    require(maxLen >= 1, "maxLen must be >= 1")
    val inf = lit(Double.PositiveInfinity)
    val sorted = array_sort(collect_list(struct(col(orderCol).as("t"),
      col(value).cast("double").as("x"))))
    val arrs = series.filter(col(value).isNotNull)
      .groupBy(col(key))
      .agg(transform(sorted, e => e.getField("x")).as("__a"))
    val ref = arrs.filter(col(key) === refKey)
      .select(col("__a").as("__b"))
    val paired = arrs.crossJoin(broadcast(ref))
      .withColumn("__n", size(col("__a")))
      .withColumn("__m", size(col("__b")))
    // init DP row (i = 0): [0, inf, inf, ...] over j = 0..m
    val initRow = concat(array(lit(0.0)),
      transform(sequence(lit(1), col("__m")), _ => inf))
    // outer fold over a; inner fold over (b_j, j) builds the next row
    val dp = aggregate(
      col("__a"),
      initRow,
      (prev, av) => aggregate(
        zip_with(col("__b"), sequence(lit(1), col("__m")),
          (bv, j) => struct(bv.as("bv"), j.as("j"))),
        array(inf),
        (acc, e) => {
          val j = e.getField("j")
          val cost = abs(av - e.getField("bv")) +
            least(element_at(prev, j), element_at(prev, j + 1),
              element_at(acc, j))
          concat(acc, array(cost))
        }))
    val dist = when(col("__n") <= maxLen && col("__m") <= maxLen,
      element_at(dp, col("__m") + 1))
    paired.select(col(key),
        col("__n").cast("long").as("n"),
        col("__m").cast("long").as("m"),
        round(dist, 6).as("dtw"),
        round(dist / (col("__n") + col("__m")).cast("double"), 6)
          .as("dtw_norm"))
  }
}
