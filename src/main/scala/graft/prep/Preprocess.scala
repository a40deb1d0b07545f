package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Expression-matrix preprocessing over the long form (F1, A1–A4;
  * `pipeline2.py:476-498`).
  *
  * All four per-probe steps (non-null threshold, median impute, conditional
  * log2, z-score) are window aggregates over `partitionBy(probe_id)`: one
  * shuffle of the fact table total, every subsequent pass reuses the same
  * partitioning — no join-back of per-probe statistics. At 1000 executors
  * the probe key is high-cardinality (54k at reference scale, unbounded for
  * larger arrays), so the partitioning is balanced by construction.
  */
object Preprocess {

  /** A1: global missing-value count (logged by the reference, py:483). */
  def missingCount(expr: DataFrame): Long =
    expr.agg(count(when(col("value").isNull, 1))).first().getLong(0)

  /** F1 + A2 + A3 + A4.
    *
    * @param expr     long (probe_id, sample_id, value) with nulls for NaN
    * @param nSamples number of sample columns in the source matrix (the
    *                 denominator of the 20% threshold, py:484)
    */
  def run(expr: DataFrame, nSamples: Int): DataFrame = {
    val w = Window.partitionBy("probe_id")
    val threshold = 0.2 * nSamples

    // F1: keep probes with >= 20%·n non-null values; A2: fill the rest with
    // the probe's median (exact median, Spark >= 3.4 built-in).
    val imputed = expr
      .withColumn("__nn", count(col("value")).over(w))
      .filter(col("__nn") >= threshold)
      .withColumn("value",
        coalesce(col("value"), median(col("value")).over(w)))
      .drop("__nn")

    // A3: conditional log2(x+1) — an adaptive plan branch picked from one
    // collected scalar, like the reference's `if data_max > 100` (py:488-491).
    // max(imputed value) == max(raw value) over the kept probes (the median
    // fill never exceeds a probe's own max), so the branch scalar comes
    // from a cheap partial-agg pass instead of the imputation window — no
    // full-matrix persist needed to avoid running that window twice.
    val dataMax = expr
      .groupBy("probe_id")
      .agg(count(col("value")).as("__nn"), max(col("value")).as("__mx"))
      .filter(col("__nn") >= threshold)
      .agg(max(col("__mx"))).first() match {
      case r if r.isNullAt(0) => Double.NegativeInfinity
      case r => r.getDouble(0)
    }
    val scaled =
      if (dataMax > 100) imputed.withColumn("value", log2(col("value") + 1))
      else imputed

    // A4: per-probe standardization, sklearn StandardScaler semantics
    // (population std, ddof=0; zero-variance rows map to 0, py:492-494).
    scaled
      .withColumn("__mu", avg("value").over(w))
      .withColumn("__sd", stddev_pop("value").over(w))
      .withColumn("value",
        when(col("__sd") === 0.0, lit(0.0))
          .otherwise((col("value") - col("__mu")) / col("__sd")))
      .drop("__mu", "__sd")
  }

  /** Robust per-group outlier statistics via the median/MAD z-score
    * (Iglewicz–Hoaglin modified z, M = 0.6745·(x − med)/MAD): the
    * outlier screen that survives the outliers it is screening for —
    * mean/stddev-based z-scores are dragged by the very rows they should
    * flag, while the 50% breakdown point of median and MAD is not. The
    * standard pre-training sanity pass over numeric telemetry/feature
    * columns.
    *
    * Two grouped medians (the value's, then the absolute deviation's —
    * MAD requires the first before the second, so two aggregate passes
    * are inherent), each a hash aggregate on the group key; per-group
    * stats join back onto the fact rows co-partitioned on that same key
    * (group-cardinality side, AQE broadcasts it when small). Medians
    * are exact while the hottest group stays under
    * [[ExactPercentileMaxGroupRows]] and dispatch to approx_percentile
    * above it; `exactMedians` skips the size probe when cardinality is
    * known. The flag boundary compares the 6-dp-rounded |M| so it
    * cannot flip on engine noise. Zero-MAD groups (> 50% identical
    * values) yield null M — counted as non-outliers, visible as
    * mad = 0.0 in the output.
    *
    * Output per group: n, med, mad, n_outliers, max_abs_m (4 dp).
    */
  // null-safe stats join-back (a plain join drops null-valued groups) —
  // shared with the k-anonymity filter, see graft.util.Joins
  private def joinGroups(df: DataFrame, stats: DataFrame,
                         groupCols: Seq[String]): DataFrame =
    graft.util.Joins.nullSafeStatsJoin(df, stats, groupCols)

  /** Rows in the hottest group above which the percentile screens stop
    * buffering exact per-group values (ObjectHashAggregate holds every
    * group value in one task) and dispatch to approx_percentile's
    * bounded-memory KLL-style sketch. 4M doubles ≈ 32 MB per hot group
    * — comfortably inside an executor; beyond it a skewed group is an
    * OOM risk, and the sketch's rank error (1/accuracy) is far below
    * the 6-dp rounding the screens already apply at their boundaries. */
  val ExactPercentileMaxGroupRows: Long =
    graft.util.Dispatch.threshold(4L * 1000 * 1000)

  private val ApproxPercentileAccuracy = 10000

  /** Size probe for the dispatch: (group count, hottest group's row
    * count) in ONE count-only aggregate (map-side partial, no value
    * buffering) — one extra scan, traded for never letting an exact
    * percentile path buffer an unbounded hot group, and reused by
    * callers that also size-dispatch a broadcast on the group-bounded
    * stats frame. Callers that know their cardinality skip the probe
    * by forcing `exact`. */
  private[graft] def groupSizeProbe(df: DataFrame,
                                    g: Seq[Column]): (Long, Long) = {
    val r = df.groupBy(g: _*).agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("__ng"), max(col("__n")).as("__mx")).head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def maxGroupRows(df: DataFrame, g: Seq[Column]): Long =
    groupSizeProbe(df, g)._2

  /** percentile-family aggregate honoring the exact/approx dispatch. */
  private def pctAgg(v: Column, p: Double, exact: Boolean): Column =
    if (exact) {
      if (p == 0.5) median(v) else percentile(v, lit(p))
    } else
      approx_percentile(v, lit(p), lit(ApproxPercentileAccuracy))

  def robustOutlierStats(df: DataFrame, groupCols: Seq[String],
                         valueCol: String, cut: Double = 3.5,
                         exactMedians: Option[Boolean] = None): DataFrame = {
    val g = groupCols.map(col)
    val v = col(valueCol)
    val exact = exactMedians.getOrElse(
      maxGroupRows(df, g) <= ExactPercentileMaxGroupRows)
    val med = df.groupBy(g: _*).agg(pctAgg(v, 0.5, exact).as("__med"))
    val withMed = joinGroups(df, med, groupCols)
    val mad = withMed.groupBy(g: _*)
      .agg(pctAgg(abs(v - col("__med")), 0.5, exact).as("__mad"))
    val m = lit(0.6745) * (v - col("__med")) / nullif(col("__mad"), lit(0.0))
    joinGroups(withMed, mad, groupCols)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        max(col("__med")).as("med"),
        max(col("__mad")).as("mad"),
        count(when(round(abs(m), 6) > cut, 1)).as("n_outliers"),
        round(max(abs(m)), 4).as("max_abs_m"))
  }

  /** Per-group winsorization report: clip values to the group's
    * [lo, hi] exact quantiles and compare the raw vs clipped mean — the
    * bounded-influence companion to [[robustOutlierStats]] (that one
    * FLAGS tail rows; this one shows what neutralizing them does to the
    * statistic a downstream consumer actually reads). Clip boundaries
    * compare against the 6-dp-rounded value so the clip count cannot
    * flip on engine quantile noise.
    *
    * One quantile aggregate on the group key + the co-partitioned
    * join-back + one final aggregate — same two-shuffle shape as the MAD
    * screen. Quantiles are exact while the hottest group stays under
    * [[ExactPercentileMaxGroupRows]] and dispatch to approx_percentile
    * above it (exact buffers every group value in one task); pass
    * `exactQuantiles` to skip the size probe when cardinality is known.
    *
    * Output per group: n, p_lo, p_hi, mean_raw, mean_wins (4 dp),
    * n_clip_lo, n_clip_hi.
    */
  def winsorizedStats(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, lo: Double = 0.05,
                      hi: Double = 0.95,
                      exactQuantiles: Option[Boolean] = None): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val g = groupCols.map(col)
    val v = col(valueCol)
    val exact = exactQuantiles.getOrElse(
      maxGroupRows(df, g) <= ExactPercentileMaxGroupRows)
    val bounds = df.groupBy(g: _*)
      .agg(pctAgg(v, lo, exact).as("__plo"),
        pctAgg(v, hi, exact).as("__phi"))
    val clipped = least(greatest(v, col("__plo")), col("__phi"))
    joinGroups(df, bounds, groupCols)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        round(max(col("__plo")), 4).as("p_lo"),
        round(max(col("__phi")), 4).as("p_hi"),
        round(avg(v), 4).as("mean_raw"),
        round(avg(clipped), 4).as("mean_wins"),
        count(when(round(v, 6) < round(col("__plo"), 6), 1)).as("n_clip_lo"),
        count(when(round(v, 6) > round(col("__phi"), 6), 1)).as("n_clip_hi"))
  }

  /** Quantile normalization (the microarray cross-sample equalizer the
    * reference's domain popularized): every sample's value distribution
    * is replaced by the rank-wise mean across samples, so all samples
    * share one distribution afterwards. Classic QN is defined on
    * equal-length columns; this long-format variant TRIMS each sample
    * to the common minimum length (deterministically, by rank under
    * (value, tieBreak) order) rather than interpolating — callers with
    * aligned samples lose nothing, ragged callers get the documented
    * truncation.
    *
    * Shape: one per-sample rank window + a min-count aggregate
    * (broadcast, 1 row) + a rank-keyed mean aggregate joined back
    * CO-PARTITIONED on the rank key — no global sort; parallelism is
    * rank cardinality for the mean and sample cardinality for the rank.
    * The ranked frame feeds two consumers (rank means + the join-back),
    * so the rank window evaluates twice; the output is fact-sized, so
    * the bounded-output materialize-and-release pattern does not apply —
    * persist the INPUT around this call when its upstream scan dominates
    * (the X3/robust-outliers trade). Complete-case on the value column:
    * a null value has no rank position (the q144 ECDF rationale — and
    * engines disagree on where nulls sort), so null-value rows are
    * dropped, not ranked. Output: input columns + qn_value (4 dp). */
  def quantileNormalize(df0: DataFrame, sampleCol: String,
                        valueCol: String,
                        tieBreak: Seq[String] = Nil): DataFrame = {
    val df = df0.filter(col(valueCol).isNotNull)
    val order = (col(valueCol).asc +: tieBreak.map(col(_).asc))
    val ranked = df.withColumn("__rn",
      row_number().over(
        Window.partitionBy(sampleCol).orderBy(order: _*)))
    // min length from the UNranked input: the count branch must not pay
    // (or re-plan) the rank window — counting needs no order
    val minLen = df.groupBy(col(sampleCol))
      .agg(count(lit(1)).as("__len"))
      .agg(min(col("__len")).as("__m"))
    val trimmed = ranked.crossJoin(broadcast(minLen))
      .filter(col("__rn") <= col("__m"))
    val rankMeans = trimmed.groupBy("__rn")
      .agg(round(avg(col(valueCol)), 4).as("qn_value"))
    trimmed.join(rankMeans, Seq("__rn"))
      .drop("__rn", "__m")
  }
}
