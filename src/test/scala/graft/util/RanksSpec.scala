package graft.util

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Dispatch-parity pins for [[Ranks.globalRunningStats]]: both the
  * window branch and the distributed two-pass branch must produce
  * identical (rank, cumulative) output — INCLUDING the leading-null
  * edge, where `sum() over` yields NULL for rows before the first
  * non-null sum value (the round-10 advisor's latent divergence: the
  * sweep used to start at 0 and emit 0 there). */
class RanksSpec extends SparkSuite {
  import spark.implicits._

  private def runBoth(rows: Seq[(Int, java.lang.Long)]) = {
    val df = rows.toDF("k", "v").withColumn("v", col("v").cast("long"))
    val n = rows.size.toLong
    def dump(threshold: Long) =
      Ranks.globalRunningStats(df, Seq(col("k")), "v", "r", "cum", n,
          distributedThreshold = threshold)
        .select("k", "r", "cum")
        .orderBy("r")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toSeq
    // threshold >= n → window branch; threshold 0 → distributed branch
    (dump(n + 1), dump(0L))
  }

  test("leading nulls: both branches emit NULL cum until the first " +
    "non-null value") {
    val rows: Seq[(Int, java.lang.Long)] =
      Seq((1, null), (2, null), (3, 5L), (4, null), (5, 7L))
    val (win, dist) = runBoth(rows)
    assert(win == dist)
    assert(win.map(_._3) ==
      Seq(None, None, Some(5L), Some(5L), Some(12L)))
  }

  test("no-null input: branches agree on rank and running sum") {
    val rows: Seq[(Int, java.lang.Long)] =
      (1 to 40).map(i => (i, java.lang.Long.valueOf((i % 7).toLong)))
    val (win, dist) = runBoth(rows)
    assert(win == dist)
    assert(win.last._3.contains(rows.map(_._2.longValue()).sum))
  }

  test("all-null sum column: every cum is NULL on both branches") {
    val rows: Seq[(Int, java.lang.Long)] =
      Seq((1, null), (2, null), (3, null))
    val (win, dist) = runBoth(rows)
    assert(win == dist)
    assert(win.forall(_._3.isEmpty))
    assert(win.map(_._2) == Seq(1L, 2L, 3L))
  }
}
