package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands: merge overlapping (or near-adjacent) per-key
  * intervals into maximal covered spans (events-family extension; same
  * event-log data model as [[Sessionize]]).
  *
  * A new island starts where an interval's start exceeds the running
  * maximum end of all earlier intervals (plus `slack`); the island id is
  * the running sum of those break flags. Two window passes over one
  * partition-by-key sort plus one hash aggregate — a single shuffle on
  * the key, no self-join, no explode of the covered range. The
  * running-max formulation (rather than lag(end)) is what makes the
  * merge correct when an early interval fully contains later ones.
  *
  * Scale: everything is per-key windowed — parallelism is the number of
  * distinct keys, and a key's rows sort within one task. That holds at
  * 100 TB when keys are plentiful (users, documents); a single global
  * interval set would serialize and should be bucketed by coarse time
  * range first.
  */
object Intervals {

  /** Peak concurrency per key — the sweep-line classic: +1 at each
    * interval start, −1 at each (exclusive) end, running sum over the
    * merged event sequence; the max of that sum is the most intervals
    * simultaneously open (server concurrency, ward occupancy, parallel
    * session count). End events sort BEFORE start events at the same
    * timestamp (end-exclusive semantics: an interval ending exactly
    * when another starts does not overlap it). One union, one per-key
    * window sort, one aggregate — the coverageStats scale contract.
    * Complete-case on both endpoints (fuzz-21): a half-specified
    * interval is no interval — and a null endpoint would otherwise
    * land in the sweep order at an engine-dependent position (Spark
    * sorts nulls first, DuckDB last), shifting every running prefix.
    * Output: (key, n_intervals BIGINT, peak BIGINT, peak_at = first
    * time the peak is reached). */
  def maxConcurrency(df0: DataFrame, key: String, startCol: String,
                     endCol: String): DataFrame = {
    val df = df0.filter(col(startCol).isNotNull && col(endCol).isNotNull)
    val starts = df.select(col(key).as("__k"),
      col(startCol).as("__t"), lit(1L).as("__d"))
    val ends = df.select(col(key).as("__k"),
      col(endCol).as("__t"), lit(-1L).as("__d"))
    // __d asc puts -1 (ends) before +1 (starts) at equal timestamps
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = starts.union(ends)
      .withColumn("__run", sum(col("__d")).over(w))
    val wBest = Window.partitionBy(col("__k"))
      .orderBy(col("__run").desc, col("__t").asc)
    swept
      .withColumn("__n", count(when(col("__d") === 1L, 1)).over(
        Window.partitionBy(col("__k"))))
      .withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col("__k").as(key), col("__n").as("n_intervals"),
        col("__run").as("peak"), col("__t").as("peak_at"))
  }

  /** Little's-law queueing profile per key over (start, end) interval
    * micros: arrival rate λ = n/span, mean time-in-system W = avg
    * duration, time-averaged occupancy L = Σduration/span — L = λ·W
    * holds by construction (the identity is the DEFINITION of the
    * time-averaged estimator; emitting all three makes the readout
    * directly comparable to external λ or W measurements) — plus the
    * sweep-line peak from [[maxConcurrency]] so the profile carries
    * the max alongside the mean. Two passes over the interval frame
    * (one aggregate, one sweep), both shuffling only on the key.
    * Output: (key, n_intervals BIGINT, span_sec 4dp,
    * arrivals_per_hour 4dp, w_avg_sec 4dp, l_avg 4dp, peak BIGINT);
    * single-instant spans yield null rates. */
  def littlesLaw(df0: DataFrame, key: String, startCol: String,
                 endCol: String): DataFrame = {
    // same complete-case contract as [[maxConcurrency]] (fuzz-21)
    val df = df0.filter(col(startCol).isNotNull && col(endCol).isNotNull)
    val dur = (col(endCol) - col(startCol)).cast("double")
    val agg = df.groupBy(col(key))
      .agg(count(lit(1)).as("n_intervals"),
        min(col(startCol)).as("__t0"), max(col(endCol)).as("__t1"),
        sum(dur).as("__sumdur"), avg(dur).as("__w"))
    val span = (col("__t1") - col("__t0")).cast("double") / 1e6
    val spanOk = nullif(span, lit(0.0))
    val peak = maxConcurrency(df, key, startCol, endCol)
      .select(col(key), col("peak"))
    agg.join(peak, Seq(key))
      .select(col(key), col("n_intervals"),
        round(span, 4).as("span_sec"),
        round(col("n_intervals") / spanOk * 3600.0, 4)
          .as("arrivals_per_hour"),
        round(col("__w") / 1e6, 4).as("w_avg_sec"),
        round(col("__sumdur") / 1e6 / spanOk, 4).as("l_avg"),
        col("peak"))
  }

  /** Allen's interval algebra over per-key interval pairs: classify
    * every ordered pair (a, b) with a.id < b.id into one of the 13
    * relations (before/meets/overlaps/starts/during/finishes/equals +
    * the 6 inverses, named with a `_inv` suffix). The full taxonomy a
    * temporal-reasoning consumer needs where [[mergeIntervals]] only
    * answers "do they touch". Pairing is per key (the bounded-key
    * contract of every pairwise operator here); the classification is
    * one nested CASE on exact endpoint comparisons. Output: (key,
    * id_a, id_b, relation). */
  def allenRelations(df0: DataFrame, key: String, idCol: String,
                     startCol: String, endCol: String): DataFrame = {
    // same complete-case contract as [[maxConcurrency]] (fuzz-21)
    val df = df0.filter(col(startCol).isNotNull && col(endCol).isNotNull)
    val a = df.select(col(key).as("__k"), col(idCol).as("id_a"),
      col(startCol).as("__sa"), col(endCol).as("__ea"))
    val b = df.select(col(key).as("__k"), col(idCol).as("id_b"),
      col(startCol).as("__sb"), col(endCol).as("__eb"))
    val sa = col("__sa"); val ea = col("__ea")
    val sb = col("__sb"); val eb = col("__eb")
    val rel =
      when(ea < sb, "before")
        .when(eb < sa, "before_inv")
        .when(ea === sb, "meets")
        .when(eb === sa, "meets_inv")
        .when(sa === sb && ea === eb, "equals")
        .when(sa === sb && ea < eb, "starts")
        .when(sa === sb && ea > eb, "starts_inv")
        .when(ea === eb && sa > sb, "finishes")
        .when(ea === eb && sa < sb, "finishes_inv")
        .when(sa > sb && ea < eb, "during")
        .when(sa < sb && ea > eb, "during_inv")
        .when(sa < sb && ea < eb, "overlaps")
        .otherwise("overlaps_inv")
    a.join(b, Seq("__k"))
      .filter(col("id_a") < col("id_b"))
      .select(col("__k").as(key), col("id_a"), col("id_b"),
        rel.as("relation"))
  }

  /** Inter-arrival exponential fit + Lilliefors-style KS distance per
    * key: gaps g_i between consecutive events (one lag window), MLE
    * rate λ̂ = 1/mean(g), and D = max_i max(|i/n − F(g_(i))|,
    * |(i−1)/n − F(g_(i))|) with F(g) = 1 − e^(−λ̂ g) — the standard
    * two-sided empirical-CDF distance, here against the FITTED
    * exponential ("is this stream Poisson-like, and how far off").
    * Two window passes (lag for gaps, rank over gaps) + one aggregate;
    * gaps are exact-microsecond differences divided once (the same
    * IEEE double in any engine), so the rank sort is engine-stable,
    * and tied gaps share F(g) — the max over their rank range is
    * rank-order-independent. Zero gaps (simultaneous events)
    * participate; keys with < 3 gaps or zero mean drop out. Output:
    * (key, n_gaps BIGINT, mean_gap_sec 4dp, rate_per_hour 4dp,
    * ks_d 4dp). */
  def interArrivalExpFit(events: DataFrame, key: String, tsCol: String,
                         tieCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    val gap = ((us - lag(us, 1).over(wOrd)) / 1000000L).as("__g")
    val gaps = events.select(col(key), gap).filter(col("__g").isNotNull)
    val wRank = Window.partitionBy(col(key))
      .orderBy(col("__g").asc)
    val wAll = Window.partitionBy(col(key))
    val ranked = gaps
      .withColumn("__i", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__mean",
        sum(col("__g")).over(wAll).cast("double") / col("__n"))
      .filter(col("__n") >= 3 && col("__mean") > 0)
    val fit = lit(1.0) - exp(-col("__g") / col("__mean"))
    ranked
      .withColumn("__d", greatest(
        abs(col("__i") / col("__n").cast("double") - fit),
        abs((col("__i") - 1) / col("__n").cast("double") - fit)))
      .groupBy(col(key))
      .agg(max(col("__n")).as("n_gaps"),
        round(max(col("__mean")), 4).as("mean_gap_sec"),
        round(lit(3600.0) / max(col("__mean")), 4).as("rate_per_hour"),
        round(max(col("__d")), 4).as("ks_d"))
  }

  /** Merged islands per key: (key, island BIGINT, start, end) — `start`/
    * `end` keep the input column names. Interval columns are numeric
    * (epoch ms/sec); `slack` in the same unit joins intervals separated
    * by a gap of at most `slack` (0 = merge only true overlap/adjacency,
    * half-open [start, end) semantics). */
  def mergeIntervals(df0: DataFrame, key: String, start: String,
                     end: String, slack: Long = 0L): DataFrame = {
    // same complete-case contract as [[maxConcurrency]] (fuzz-21)
    val df = df0.filter(col(start).isNotNull && col(end).isNotNull)
    val byStart = Window.partitionBy(key)
      .orderBy(col(start), col(end))
    // Running max end over STRICTLY earlier rows; null for the first row
    // of a key → break flag true.
    val prevMaxEnd = max(col(end)).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df.withColumn("__brk",
      when(prevMaxEnd.isNull || col(start) > prevMaxEnd + lit(slack), 1L)
        .otherwise(0L))
    val island = sum(col("__brk")).over(
      byStart.rowsBetween(Window.unboundedPreceding, 0))
    flagged.withColumn("island", island)
      .groupBy(col(key), col("island"))
      .agg(min(col(start)).as(start), max(col(end)).as(end))
  }

  /** Per-key coverage stats over the merged islands: n_islands,
    * covered (sum of merged lengths), longest (max merged length) —
    * all in the interval columns' numeric unit. */
  def coverageStats(df: DataFrame, key: String, start: String,
                    end: String, slack: Long = 0L): DataFrame =
    mergeIntervals(df, key, start, end, slack)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_islands"),
        sum(col(end) - col(start)).as("covered"),
        max(col(end) - col(start)).as("longest"))
}
