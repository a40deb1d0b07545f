package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Multi-action input pinning (optimization guide §1.2/§5).
  *
  * The graph/ML operators probe their inputs (size-dispatch counts,
  * guard counts) and then read them again (driver collect, or the
  * distributed loop's first pass). An unpersisted input DataFrame is
  * re-executed from source on EVERY action — for catalog queries whose
  * node/edge frames derive from a 4-table fact join, the probe+collect
  * sequence replayed that join up to 4× (measured on q80_pagerank:
  * ~31 stages, 4 identical ~0.25 s pipeline executions; same shape in
  * q52/q53/q132/q138/q169/q139/q241/q242/q296).
  *
  * `pinned(dfs){body}` persists the given frames for the duration of
  * `body` and unpersists them after. Frames the CALLER already
  * persisted are left untouched (their lifecycle is the caller's).
  * Correctness-neutral by construction: unpersist only drops cached
  * blocks — any consumer evaluated later recomputes from source.
  * Callers whose returned frame must outlive the pin materialize it
  * first (every distributed graph loop localCheckpoints its rounds;
  * driver paths return collected-array results).
  */
object Pin {
  def pinned[T](dfs: DataFrame*)(body: => T): T = {
    val mine = dfs.filter(_.storageLevel == StorageLevel.NONE)
    mine.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    try body
    finally mine.foreach(_.unpersist(false))
  }
}
