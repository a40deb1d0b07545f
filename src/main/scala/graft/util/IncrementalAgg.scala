package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (X88): keep a per-key STATE table
  * of mergeable statistics (count, sum, min, max) so a new data delta
  * updates the rollup by merging two state tables instead of
  * rescanning history — the materialized-view maintenance pattern that
  * turns an O(history) nightly job into O(delta).
  *
  * The whole design rests on the statistics being commutative monoids:
  * merge(state(A), state(B)) = state(A ∪ B) for any split, which is
  * exactly what the catalog oracle checks (it recomputes from the full
  * table — an INDEPENDENT formulation, so the compare proves
  * mergeability, not a replay). Derived metrics (avg) are finalized
  * from the merged state, never maintained directly — averages don't
  * merge, sums do.
  *
  * Scale: building a state is one map-side-partial hash aggregate over
  * the slice; merging is a key-grain aggregate over the CONCATENATED
  * state tables (key-bounded, not fact-bounded). Integer sums stay
  * exact.
  */
object IncrementalAgg {

  /** Per-key mergeable state: (keys..., cnt, sum, min, max). */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum"),
        min(col(valueCol)).as("min"), max(col(valueCol)).as("max"))

  /** Merge any number of state tables (same schema) into one. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum")).as("sum"),
        min(col("min")).as("min"), max(col("max")).as("max"))
  }

  /** Finalize reader-facing metrics from a state table. */
  def finalizeState(state: DataFrame): DataFrame =
    state.withColumn("avg",
      round(col("sum").cast("double") / col("cnt"), 4))
}
