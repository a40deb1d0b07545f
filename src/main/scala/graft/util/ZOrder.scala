package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave keys for multi-dimensional data layout.
  *
  * Sorting / range-partitioning a table by `morton2(x, y)` clusters rows
  * that are close in BOTH dimensions into the same files, so min/max
  * file statistics prune scans for predicates on either dimension — the
  * standard data-skipping layout for 100 TB lakehouse tables (a sort by
  * x alone prunes x-predicates but scatters y). The engine-side cost is
  * one `repartitionByRange(morton2(...))` + sortWithinPartitions at
  * write time; reads then skip via ordinary parquet row-group stats.
  *
  * The bit spread is the classic shift-and-mask ladder — pure integer
  * arithmetic on built-in functions, so it stays inside whole-stage
  * codegen (no UDF) and is reproducible in any engine (the oracle
  * replicates it in ANSI SQL).
  */
object ZOrder {

  /** Spread the low 16 bits of a non-negative int so bit i lands at
    * position 2i (result occupies 32 bits). */
  def spread16(v: Column): Column = {
    val x0 = v.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit non-negative coordinates: x takes
    * the even bit positions, y the odd. Monotone in the interleaved
    * order — equal prefixes = same quadtree cell. */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
}
