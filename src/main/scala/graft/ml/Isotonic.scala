package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone nondecreasing) regression by pool-adjacent-
  * violators — the calibration fit behind reliability curves: replace
  * per-bucket raw rates with the closest nondecreasing sequence in
  * weighted L2 ([[Calibration.reliability]] SHOWS miscalibration;
  * this REPAIRS it, the classifier-calibration step sklearn calls
  * IsotonicRegression).
  *
  * Facts collapse to (key, bucket, w = count, sy = Σ label) first —
  * bucket-bounded — then PAVA runs per key over the sorted bucket
  * array in O(buckets) (a true pooling recurrence: mapGroups, the
  * Brandes/cusum precedent for genuinely sequential kernels).
  * Exactness: block means are ratios of EXACT INTEGER sums (labels
  * are 0/1 longs), and the pooling comparison cross-multiplies in
  * integers — so the fit is bit-identical to the minimax closed form
  * y*_k = min_{j≥k} max_{i≤k} wavg(y[i..j]) an independent engine
  * computes from prefix sums (the q297 oracle proves exactly that).
  */
object Isotonic {

  final case class IsoPoint(key: String, bucket: Double, n: Long,
                            rate_raw: Double, rate_iso: Double)

  /** Per-(key, bucket) raw and isotonic rates of a 0/1 label:
    * (key, bucket, n BIGINT, rate_raw 6dp, rate_iso 6dp), rate_iso
    * nondecreasing in bucket within each key. Complete-case on
    * bucket AND label (fuzz-17 finding: a null bucket has no place
    * on the monotone axis — and used to crash the non-nullable
    * tuple encoder outright); a null KEY is a real group and is
    * kept. */
  def calibrate(df: DataFrame, keyCol: String, bucketCol: String,
                labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val buckets = df
      .filter(col(bucketCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("k"),
        col(bucketCol).cast("double").as("b"))
      .agg(count(lit(1)).as("w"), sum(col(labelCol).cast("long")).as("sy"))
      .as[(String, Double, Long, Long)]
    buckets.groupByKey(_._1).flatMapGroups { (k, it) =>
      val pts = it.toArray.sortBy(_._2)
      // stack of pooled blocks (wSum, sySum, nPoints)
      val stack = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Int)]
      pts.foreach { case (_, _, w, sy) =>
        var cw = w; var cs = sy; var cn = 1
        // pool while the previous block's mean >= this block's mean
        // (ls/lw >= cs/cw, cross-multiplied in exact integers)
        while (stack.nonEmpty &&
            stack.last._2 * cw >= cs * stack.last._1) {
          val (lw, ls, ln) = stack.remove(stack.length - 1)
          cw += lw; cs += ls; cn += ln
        }
        stack += ((cw, cs, cn))
      }
      val iso = new Array[Double](pts.length)
      var i = 0
      stack.foreach { case (w, sy, n) =>
        val v = sy.toDouble / w
        var j = 0
        while (j < n) { iso(i) = v; i += 1; j += 1 }
      }
      pts.zipWithIndex.map { case ((_, b, w, sy), ix) =>
        IsoPoint(k, b, w, sy.toDouble / w, iso(ix))
      }.iterator
    }.toDF("key", "bucket", "n", "rate_raw", "rate_iso")
      // rounding via the Column round (not driver-side BigDecimal) so
      // the 6-dp convention is the same codepath every catalog query
      // uses against the oracle
      .select(col("key"), col("bucket"), col("n"),
        round(col("rate_raw"), 6).as("rate_raw"),
        round(col("rate_iso"), 6).as("rate_iso"))
  }
}
