package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range (interval) join: pair each interval row with the point
  * rows of the same key whose time falls in [start, end) — "events inside
  * a window around each anchor", the attribution/feature-window primitive.
  *
  * Spark plans a raw `l.key = r.key AND r.ts >= l.start AND r.ts <
  * l.end` as a sort-merge join on the key alone with the range as a
  * post-join filter — every point joins every interval of its key first
  * (quadratic per key), which at 100 TB of events is the canonical
  * accidental-cartesian. The banded form makes the range part of the
  * JOIN KEY: time is bucketed into fixed-width bands, each interval is
  * exploded to the bands it overlaps (ceil(span/width)+1 rows — bounded
  * fan-out, ~2 for span <= width), points map to exactly one band, and
  * the join runs as a plain equi-join on (key, band) followed by the
  * exact range filter on the (small) banded candidate set. One shuffle
  * each side, candidate count ∝ true matches + band slop, never per-key
  * cartesian. Pick `bandWidthSec` near the typical interval span: wider
  * bands = fewer interval replicas but more slop rows filtered after the
  * join; narrower = the reverse.
  *
  * Output: one row per (interval, matching point) pair — interval columns
  * + the point's columns (point key/time under their original names).
  * Callers aggregate per interval id as needed; intervals with no match
  * produce no rows (inner semantics; left-outer is the caller's
  * re-join against the interval table).
  */
object RangeJoin {

  def bandedIntervalJoin(intervals: DataFrame, points: DataFrame,
                         key: String, startCol: String, endCol: String,
                         pointTime: String, bandWidthSec: Long): DataFrame = {
    require(bandWidthSec > 0, "bandWidthSec must be positive")
    val reserved = Seq("__band")
    require(!(intervals.columns ++ points.columns).exists(reserved.contains),
      "inputs must not contain a __band column")
    val overlap = intervals.columns.toSet
      .intersect(points.columns.toSet) - key
    require(overlap.isEmpty,
      s"point columns ${overlap.mkString(",")} collide with interval " +
        "columns — rename before joining")

    def band(c: Column): Column =
      floor(unix_timestamp(c) / bandWidthSec).cast("long")

    // end is exclusive: a point at exactly `end` never matches, so the
    // last band only needs to cover end - 1µs; banding end directly is
    // still correct (one extra candidate band at worst, filtered below).
    // Inverted intervals (end < start) can never match — but sequence()
    // would happily generate their DESCENDING band list and join every
    // band of the bogus span before the exact filter drops it all, so
    // corrupt rows are dropped up front (cheap) instead of amplified.
    val banded = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__band",
        explode(sequence(band(col(startCol)), band(col(endCol)))))
    val pts = points.withColumn("__band", band(col(pointTime)))

    banded.join(pts, Seq(key, "__band"))
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__band")
  }

  /** Interval–interval overlap join (the genomic/temporal "which spans
    * intersect" primitive): pair rows of the same key whose HALF-OPEN
    * intervals overlap (sL < eR AND sR < eL). Same banding idea as
    * [[bandedIntervalJoin]], applied to BOTH sides — each interval
    * explodes to its covered bands and the join is a plain equi-join on
    * (key, band) plus the exact predicate. A pair overlapping several
    * shared bands would duplicate, so candidates are kept only in the
    * band containing the OVERLAP START (greatest of the two starts):
    * exactly one band per true pair, no post-join `distinct` pass.
    * Timestamp columns; `bandWidthSec` near the typical span. */
  def bandedOverlapJoin(left: DataFrame, right: DataFrame, key: String,
                        startL: String, endL: String,
                        startR: String, endR: String,
                        bandWidthSec: Long): DataFrame = {
    require(bandWidthSec > 0, "bandWidthSec must be positive")
    require(!(left.columns ++ right.columns).contains("__band"),
      "inputs must not contain a __band column")
    val overlapCols = left.columns.toSet
      .intersect(right.columns.toSet) - key
    require(overlapCols.isEmpty,
      s"right columns ${overlapCols.mkString(",")} collide with left " +
        "columns — rename before joining")

    def band(c: Column): Column =
      floor(unix_timestamp(c) / bandWidthSec).cast("long")

    // STRICT inequality: an empty interval [s, s) can never overlap
    // anything, but the two-clause predicate below (exact only for
    // non-empty inputs) would wrongly admit it — so empties are dropped
    // here, which also keeps the overlap-start-band dedup condition
    // consistent with the predicate.
    val l = left.filter(col(endL) > col(startL))
      .withColumn("__band",
        explode(sequence(band(col(startL)), band(col(endL)))))
    val r = right.filter(col(endR) > col(startR))
      .withColumn("__band",
        explode(sequence(band(col(startR)), band(col(endR)))))
    l.join(r, Seq(key, "__band"))
      .filter(col(startL) < col(endR) && col(startR) < col(endL) &&
        col("__band") === band(greatest(col(startL), col(startR))))
      .drop("__band")
  }
}
