package graft.report

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto-front) query: the rows not dominated by any
  * other row, where p dominates q iff p.x ≤ q.x ∧ p.y ≤ q.y with at
  * least one strict (both axes minimized; negate a column to maximize).
  * The multi-objective "best candidates" cut — cheapest AND smallest
  * part, fastest AND cheapest supplier — that a top-k on any single
  * score cannot express.
  *
  * Shape: the sort-based O(n log n) skyline instead of the naive O(n²)
  * dominance self-join. Membership depends only on the (x, y) pair, so
  * the input first collapses to one row per distinct x with its min y;
  * a rows-frame running min over that DISTINCT-X table (ordered by x,
  * each row a distinct x — so "previous rows" IS "strictly smaller x",
  * with no value-offset range frame) marks the skyline (x, y) pairs,
  * and an equi-join on x restores every input row carrying a skyline
  * pair — exact duplicates are all kept (neither dominates the other —
  * the standard definition).
  *
  * Scale: the global window runs over DISTINCT x values of an
  * entity-grain input (the rocAuc/BH bounded-aggregate trade); the
  * join-back is co-partitioned on x. For fact-grain inputs, run
  * [[localPrefilter]] first: it keeps each partition's local skyline —
  * a superset of the global skyline — in one shuffle-free streaming
  * pass, so the global stage sees only survivors. */
object Skyline {

  /** Rows of `df` on the (x, y)-minimizing skyline. Complete-case on
    * both dimensions (fuzz-25): a row with an unknown coordinate can
    * neither dominate nor be dominated — and a null x would otherwise
    * sort to an engine-dependent end of the distinct-x sweep. */
  def skyline2d(df0: DataFrame, x: String, y: String): DataFrame = {
    val df = df0.filter(col(x).isNotNull && col(y).isNotNull)
    val wOrd = Window.orderBy(col(x))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pairs = df.groupBy(col(x)).agg(min(col(y)).as("__my"))
      .withColumn("__prev", min(col("__my")).over(wOrd))
      .filter(col("__prev").isNull || col("__prev") > col("__my"))
      .select(col(x).as("__sx"), col("__my"))
    df.join(pairs,
        df(x) === col("__sx") && df(y) === col("__my"))
      .drop("__sx", "__my")
  }

  /** Shuffle-free per-partition skyline prefilter: sorts each existing
    * partition by (x, y) and streams it once, keeping a row iff its y
    * equals its x-run's minimum and no strictly-smaller x in the
    * partition had y ≤ it. Output is a superset of the global skyline
    * (dominance within a partition implies dominance globally) with
    * the same schema — feed it to [[skyline2d]]. */
  def localPrefilter(df: DataFrame, x: String, y: String): DataFrame = {
    val xi = df.schema.fieldIndex(x)
    val yi = df.schema.fieldIndex(y)
    val sorted = df.sortWithinPartitions(col(x).asc, col(y).asc)
    val kept = sorted.rdd.mapPartitions { it =>
      var bestPrev = Double.MaxValue   // min y over strictly smaller x
      var runX: Any = null             // current x run (first = min y)
      var runMin = Double.MaxValue
      var started = false
      it.flatMap { row: Row =>
        val xv = row.get(xi)
        val yv = row.getAs[Number](yi).doubleValue()
        if (!started || xv != runX) {
          if (started) bestPrev = math.min(bestPrev, runMin)
          runX = xv; runMin = yv; started = true
        }
        if (yv == runMin && runMin < bestPrev) Some(row) else None
      }
    }
    df.sparkSession.createDataFrame(kept, df.schema)
  }
}
