package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single right row with the
  * largest right time <= left time (or < for `strict`) within the same
  * key — the point-in-time lookup every event/feature pipeline needs
  * (DuckDB/kdb `ASOF JOIN`, pandas `merge_asof`), which Spark has no
  * built-in operator for.
  *
  * A naive translation is a non-equi join (`l.key = r.key AND l.ts >=
  * r.ts`) + argmax — Spark plans that as a per-key cartesian explosion
  * (every left row joins every earlier right row before the argmax
  * prunes), quadratic per key and a guaranteed scale-killer on 100 TB of
  * events. This operator instead UNIONS the two tagged inputs and takes
  * one window pass: partition by key, order by (time, side), carry the
  * last non-null right payload forward. Cost = one shuffle of
  * (left + right) on the key + a per-key sort — the same price as a
  * single sort-merge join, linear in input, no row amplification. The
  * window frame is running (UNBOUNDED PRECEDING .. CURRENT ROW), which
  * Spark evaluates streamingly within each partition — no frame re-scan.
  *
  * Ties: a right row at exactly left time is visible when `strict =
  * false` (sorted before the left row via the side tag), hidden when
  * `strict = true` (sorted after). Multiple right rows sharing (key,
  * time) are resolved deterministically by `rightTieBreak` (largest
  * wins), so results never depend on partitioning.
  *
  * Output: every left row (left-outer semantics) with the matched right
  * payload struct's fields appended (null fields when no prior right row
  * exists).
  */
object AsOfJoin {

  def asOfBackward(left: DataFrame, right: DataFrame,
                   key: String, time: String,
                   payload: Seq[String],
                   strict: Boolean = false,
                   rightTieBreak: Option[String] = None): DataFrame = {
    val reserved = Seq("__side", "__payload", "__tie")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"inputs must not contain ${reserved.mkString("/")} columns")
    require(payload.nonEmpty, "payload must name at least one right column")
    require(payload.forall(p => !left.columns.contains(p)),
      "payload column names must not collide with left columns — rename " +
        "the right side's payload columns before joining")

    // Right rows sort BEFORE left rows at equal time for inclusive (>=)
    // semantics, AFTER for strict (>): the carried-forward payload at the
    // left row then includes / excludes the simultaneous right row.
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)

    val leftCols = left.columns.map(col)
    val lhs = left.select(
      (leftCols :+ lit(leftSide).as("__side")
        :+ lit(null).cast(structType(right, payload)).as("__payload")
        :+ lit(null).cast("long").as("__tie")): _*)
    val rhs = right.select(
      col(key), col(time), lit(rightSide).as("__side"),
      struct(payload.map(col): _*).as("__payload"),
      rightTieBreak.map(col(_).cast("long")).getOrElse(lit(0L)).as("__tie"))
    // Align columns: left-only columns become null on the right side.
    val rhsAligned = lhs.columns.foldLeft(rhs) {
      case (df, c) if !df.columns.contains(c) =>
        df.withColumn(c, lit(null).cast(fieldType(left, c)))
      case (df, _) => df
    }.select(lhs.columns.map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lhs.unionByName(rhsAligned)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide)

    val out = left.columns.map(col) ++
      payload.map(p => col(s"__m.$p").as(p))
    matched.select(out: _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))

  private def fieldType(df: DataFrame, c: String) = df.schema(c).dataType
}
