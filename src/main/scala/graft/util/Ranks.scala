package graft.util

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global row-number assignment with the [[graft.de.Stats.bhAdjust]]
  * size dispatch: a plain single-partition window below the threshold
  * (exact, simple, fine for bounded aggregates), and above it a
  * distributed two-pass rank — range-repartition on the sort key, count
  * rows per partition, then add each partition's global offset in one
  * mapPartitions sweep. No single-partition sort ever materializes on
  * the large path, and both paths produce the identical total order
  * (the caller supplies a tie-breaking sort, making row numbers
  * deterministic).
  */
object Ranks {

  /** Append `out` = 1-based global row number of `df` under `sortCols`
    * (which must define a TOTAL order — include a unique tie-break).
    * `n` is the caller-known row count (callers typically just counted
    * or aggregated the frame; passing it avoids a redundant job). */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column], out: String,
                      n: Long,
                      distributedThreshold: Long = 2000000L): DataFrame =
    if (n <= distributedThreshold)
      df.withColumn(out,
        row_number().over(Window.orderBy(sortCols: _*)).cast("long"))
    else {
      val spark = df.sparkSession
      val nPart = math.max(spark.sparkContext.defaultParallelism,
        (n / 500000L).toInt + 1)
      val sorted = df.repartitionByRange(nPart, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val counts = sorted.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
        .collect().sortBy(_._1).map(_._2.toLong)
      val offsets = counts.scanLeft(0L)(_ + _)
      val schema = sorted.schema.add(out, LongType, nullable = false)
      val ranked = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
        var r = offsets(pi)
        it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
      }
      val result = spark.createDataFrame(ranked, schema).localCheckpoint()
      sorted.unpersist(false)
      result
    }
}
