package graft.util

import org.apache.spark.sql.DataFrame

/** Row-count-derived partition sizing for small persisted iteration
  * frames (opt guide §1.2 "the distributed algorithm first", §2.2
  * tiny-task overhead).
  *
  * An iterative operator that re-aggregates a persisted frame on every
  * step pays the frame's cached partition count in task launches PER
  * STEP — and cached plans keep their full shuffle partitioning
  * (`spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` is off
  * by default, so AQE never coalesces them). Measured on q386_cox_ph at
  * sf0.1: the ~15k-row `cells` frame cached as 32 near-empty blocks
  * cost each of 9 Newton steps a 32-task scan stage (~0.2 s/task of
  * pure launch/contention overhead at local[32]); the same query at
  * local[8] ran 2.2× faster on identical data.
  *
  * [[byRows]] maps a measured row count to a partition count at
  * `rowsPerPartition` rows per partition, clamped to the frame's
  * current partitioning so a genuinely large frame is never shrunk
  * below its shuffle layout — scale-adaptive by construction (at fact
  * scale the computed partition count exceeds the cached layout and
  * the frame is returned unchanged). Returns a `coalesce()` view; the
  * underlying cache blocks are untouched, so callers keep
  * persist/unpersist ownership of the input.
  */
object Sized {

  /** Narrow-row default: 256k rows/partition keeps a partition in the
    * hundreds-of-KB-to-MB range for the aggregate-grain frames this is
    * meant for, far under task-memory pressure. */
  val DefaultRowsPerPartition: Long = 262144L

  def byRows(df: DataFrame, rows: Long,
             rowsPerPartition: Long = DefaultRowsPerPartition): DataFrame = {
    val cur = df.rdd.getNumPartitions
    val want = math.max(1L, (rows + rowsPerPartition - 1) / rowsPerPartition)
    if (want < cur) df.coalesce(want.toInt) else df
  }

  /** Partition count for a CPU-DENSE verification join, derived from
    * the MEASURED candidate-pair count — [[byRows]] inverted: a
    * width RAISER for stages whose post-shuffle partitions are
    * byte-light but CPU-dense (string-shingle equi-joins), which
    * AQE's byte-based coalescing collapses to a handful of tasks at
    * small-byte grain (q258 at sf0.1: 8.1 s of verify CPU in 3
    * AQE-coalesced tasks; `coalescePartitions.minPartitionSize`'s
    * 1 MB floor wins over parallelismFirst). A global config floor
    * was measured and rejected in r14 as local-grain-only; this is
    * the operator-internal, scale-adaptive form: ~[[PairsPerVerifyPartition]]
    * pairs/task ≈ 0.3-0.5 s of verify CPU at the measured per-pair
    * cost (per-pair cost tracks document shingle counts, which are
    * scale-invariant), and the width grows linearly with measured
    * candidate volume, so cluster-scale candidate sets get
    * cluster-scale widths without any tuned constant. Capped at 64k
    * partitions as an absurdity guard. */
  val PairsPerVerifyPartition: Long = 8192L
  def verifyParts(pairs: Long,
                  pairsPerPartition: Long = PairsPerVerifyPartition): Int =
    math.max(1L, math.min(
      (pairs + pairsPerPartition - 1) / pairsPerPartition, 1L << 16)).toInt
}
