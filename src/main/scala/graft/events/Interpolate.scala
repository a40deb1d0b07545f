package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear interpolation of missing series values (X97): interior nulls
  * take the line between the nearest non-null neighbors; leading /
  * trailing nulls clamp to the nearest known value (the pandas
  * `interpolate(limit_direction='both')` convention, stated because
  * edge handling is where implementations silently differ). The repair
  * step between gap-DETECTION (the DQ expectations) and downstream
  * smoothing (EWMA/Holt) — those operators assume dense series.
  *
  * Mechanics: two window passes sharing one per-key sort — a forward
  * (last non-null value AND its position) and a backward mirror — then
  * one arithmetic projection:
  * v = prev + (next − prev)·(t − t_prev)/(t_next − t_prev). With
  * integer positions and integer/cents values every interpolated
  * number is a ratio of exact integers — engine-identical before the
  * 4-dp round.
  */
object Interpolate {

  /** Output: (key, orderCol, value — original where present, x_interp
    * 4-dp always populated unless the whole key is null, is_filled). */
  def linear(series: DataFrame, key: String, orderCol: String,
             value: String): DataFrame = {
    val wFwd = Window.partitionBy(col(key)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBwd = Window.partitionBy(col(key)).orderBy(col(orderCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val t = col(orderCol).cast("double")
    val marked = series
      .withColumn("__pv", last(col(value), ignoreNulls = true).over(wFwd))
      .withColumn("__pt",
        last(when(col(value).isNotNull, t), ignoreNulls = true).over(wFwd))
      .withColumn("__nv",
        first(col(value), ignoreNulls = true).over(wBwd))
      .withColumn("__nt",
        first(when(col(value).isNotNull, t), ignoreNulls = true)
          .over(wBwd))
    marked.select(col(key), col(orderCol), col(value),
      round(
        when(col(value).isNotNull, col(value).cast("double"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              (t - col("__pt")) / (col("__nt") - col("__pt")))
          .otherwise(coalesce(col("__pv"), col("__nv")).cast("double")),
        4).as("x_interp"),
      col(value).isNull.as("is_filled"))
  }
}
