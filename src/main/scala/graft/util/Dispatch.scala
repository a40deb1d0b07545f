package graft.util

/** Global override for the library's size-dispatch thresholds.
  *
  * Many operators pick between two result-identical implementations by
  * input size: a small branch (driver loop, single-sort window, exact
  * percentile, broadcast hint) and a scale branch (distributed
  * two-pass, DataFrame fixpoint, sketch percentile, shuffle join).
  * The small branch is what every fixture-sized test and the sf0.01
  * oracle exercise — which means the scale branches, the ones that
  * actually run on a 100 TB cluster, would never face the DuckDB
  * oracle at all. `SPARK_GRAFT_FORCE_DISPATCH=distributed` flips every
  * dispatch to its scale branch regardless of input size, so the
  * sf1-oracle gate (tools/ScaleVerify) can prove on real data that the
  * distributed implementations return oracle-identical answers.
  *
  * Scope: ONLY genuine dispatches between equivalent implementations.
  * Fail-fast contract guards (betweenness driver-collectable caps,
  * maxDistinct* single-sort guards, concordance tree guard) keep their
  * documented values — forcing those to zero would reject all input,
  * not exercise a branch.
  */
object Dispatch {
  val forceDistributed: Boolean =
    sys.env.get("SPARK_GRAFT_FORCE_DISPATCH").contains("distributed")

  /** Default-parameter hook: `threshold(2000000L)` is 2000000 normally
    * and -1 under the force flag (so even empty inputs take the scale
    * branch — `n <= -1` is false for every count). Evaluated at call
    * time (Scala default params are call-site expressions), so one
    * process sees one consistent setting. */
  def threshold(default: Long): Long = if (forceDistributed) -1L else default
}
