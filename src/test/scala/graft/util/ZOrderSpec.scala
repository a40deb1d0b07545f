package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** Reference bit-by-bit interleave. */
  private def mortonRef(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x.toLong >> i & 1L) << (2 * i)) |
        ((y.toLong >> i & 1L) << (2 * i + 1))
    }

  test("morton2 matches bit-by-bit reference over exhaustive 6-bit grid") {
    val pairs = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    val got = pairs.toDF("x", "y")
      .withColumn("z", ZOrder.morton2(col("x"), col("y")))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y)) }
  }

  test("morton2 handles full 16-bit coordinates") {
    val pairs = Seq((65535, 65535), (65535, 0), (0, 65535), (12345, 54321))
    val got = pairs.toDF("x", "y")
      .withColumn("z", ZOrder.morton2(col("x"), col("y")))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y)) }
  }

  test("z-cells bound both dimensions (the skipping property)") {
    // Group an 8x8 grid into 16-key z-cells: each cell must span at most
    // a 4x4 box in (x, y) — that bounded box is exactly what makes
    // min/max file stats prune 2-D predicates after a z-order sort.
    val pairs = for (x <- 0 until 8; y <- 0 until 8) yield (x, y)
    val cells = pairs.toDF("x", "y")
      .withColumn("cell", shiftright(ZOrder.morton2(col("x"), col("y")), 4))
      .groupBy("cell")
      .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")))
      .as[(Long, Int, Int)].collect()
    assert(cells.length == 4)
    cells.foreach { case (_, xs, ys) => assert(xs <= 3 && ys <= 3) }
  }
}
