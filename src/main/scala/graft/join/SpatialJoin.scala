package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked planar nearest-neighbor join — the spatial member of
  * the join family ([[AsOfJoin]] time, [[RangeJoin]] intervals,
  * [[FuzzyJoin]] edit distance): for each left point, the closest
  * right point within `radius`.
  *
  * The naive form is an all-pairs distance scan. Blocking: bucket both
  * sides into square cells of side `radius`; any pair within `radius`
  * of each other lies in the same or an adjacent cell, so each left
  * point probes only its 3×3 cell neighborhood — the probe explode is
  * a constant ×9, and the join is a plain equi-join on the cell key.
  * Per-cell density bounds the candidate fan-out exactly the way the
  * band width does in [[RangeJoin]]; a hot cell (urban cluster) is the
  * skew knob — shrink `radius` or salt the cell, same trade as every
  * banded join here.
  *
  * The argmin is a min-of-struct over the 6-dp-rounded distance with
  * the right id as tie-break, so equidistant neighbors resolve
  * deterministically on any engine. Lefts with no right inside
  * `radius` are absent from the output (left-outer semantics would
  * null-fill; callers that need "coverage" metrics anti-join).
  */
object SpatialJoin {

  /** (left_id, nearest_id, dist DOUBLE rounded 6dp): the closest right
    * point within `radius` of each left point, euclidean plane. */
  def nearestWithinRadius(left: DataFrame, right: DataFrame,
                          leftId: String, rightId: String,
                          lx: String, ly: String,
                          rx: String, ry: String,
                          radius: Double): DataFrame = {
    require(radius > 0, "radius must be positive")
    def cell(c: Column): Column = floor(c / radius).cast("long")
    val probes = left.select(col(leftId).as("left_id"),
        col(lx).as("__lx"), col(ly).as("__ly"),
        cell(col(lx)).as("__cx0"), cell(col(ly)).as("__cy0"))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("left_id"), col("__lx"), col("__ly"),
        (col("__cx0") + col("__dx")).as("__cx"),
        (col("__cy0") + col("__dy")).as("__cy"))
    val cells = right.select(col(rightId).as("nearest_id"),
      col(rx).as("__rx"), col(ry).as("__ry"),
      cell(col(rx)).as("__cx"), cell(col(ry)).as("__cy"))
    val dist = round(sqrt(
      (col("__lx") - col("__rx")) * (col("__lx") - col("__rx")) +
        (col("__ly") - col("__ry")) * (col("__ly") - col("__ry"))), 6)
    probes.join(cells, Seq("__cx", "__cy"))
      .withColumn("__d", dist)
      .filter(col("__d") <= radius)
      .groupBy(col("left_id"))
      .agg(min(struct(col("__d"), col("nearest_id"))).as("__m"))
      .select(col("left_id"), col("__m.nearest_id").as("nearest_id"),
        col("__m.__d").as("dist"))
  }
}
