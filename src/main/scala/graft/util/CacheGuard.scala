package graft.util

import org.apache.spark.sql.DataFrame

/** Guard helper for the persist-then-count cardinality gates
  * (rocAuc, kaplanMeier, jonckheereTerpstra, …): the guard runs AFTER
  * `.persist()` (the count is the materialization), so a plain
  * `require` that fires would leak the cached DataFrame in a
  * long-lived session — the very leak the localCheckpoint/unpersist
  * pattern exists to avoid. This variant releases the cache entry
  * before throwing; the thrown exception matches `require`'s
  * (IllegalArgumentException, "requirement failed: " prefix) so
  * callers and specs see identical behavior. */
object CacheGuard {
  def requireReleasing(cond: Boolean, cached: DataFrame)(msg: => String): Unit =
    if (!cond) {
      cached.unpersist(false)
      throw new IllegalArgumentException("requirement failed: " + msg)
    }
}
