package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-parametric monotone-trend statistics over per-key ordered series:
  * the Mann–Kendall S statistic and the Theil–Sen (median-of-pairwise-
  * slopes) trend estimator — the robust companions to [[graft.de
  * .RankStats.groupedOls]]'s least-squares line (a single outlier moves
  * OLS arbitrarily; Theil–Sen tolerates ~29% contamination).
  *
  * Both statistics are inherently pairwise (O(d²) in the series length
  * d), so the contract is the same as [[RankStats.autocorr]] and the
  * changepoint scan: they run over a per-key AGGREGATE series whose
  * length is calendar-bounded (daily/hourly buckets), never over raw
  * facts. At 100 TB the fact table collapses to keys×buckets rows
  * before the self-join; the pair fan-out is d(d−1)/2 per key — 435
  * pairs for a 30-day daily series — and the bucket grain is the knob.
  *
  * Exactness: with integer-valued series (counts) the sign sum is exact
  * by construction, and every pairwise slope is the same double in any
  * engine (one division of exact integers); the Theil–Sen median
  * averages the two middle slopes on even pair counts (the
  * interpolating convention both Spark's `median` and DuckDB's
  * `quantile_cont(0.5)` implement).
  */
object TrendStats {

  /** Per-key Mann–Kendall S and Theil–Sen slope of `value` over the
    * numeric `orderCol` (unique per key): (key, n_points, n_pairs,
    * mk_s BIGINT, theil_sen 6-dp). S > 0 = increasing trend; |S| close
    * to n_pairs = near-monotone. Keys with a single point drop out (no
    * pairs). */
  def trend(series: DataFrame, key: String, orderCol: String,
            value: String): DataFrame = {
    val base = series.select(col(key).as("__k"),
      col(orderCol).cast("double").as("__t"),
      col(value).cast("double").as("__x"))
    val lhs = base.select(col("__k"), col("__t").as("__t1"),
      col("__x").as("__x1"))
    val rhs = base.select(col("__k"), col("__t").as("__t2"),
      col("__x").as("__x2"))
    val pairs = lhs.join(rhs, Seq("__k"))
      .filter(col("__t1") < col("__t2"))
      .select(col("__k"),
        signum(col("__x2") - col("__x1")).as("__sg"),
        ((col("__x2") - col("__x1")) / (col("__t2") - col("__t1")))
          .as("__sl"))
    val nPts = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_points"))
    pairs.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__sg")).cast("long").as("mk_s"),
        round(median(col("__sl")), 6).as("theil_sen"))
      .join(nPts, Seq("__k"))
      .select(col("__k").as(key), col("n_points"), col("n_pairs"),
        col("mk_s"), col("theil_sen"))
  }
}
