package graft

import org.apache.spark.sql.functions._

/** Pins the accuracy of the approximate sketches SCALE.md names as the
  * ultra-high-cardinality fallbacks for exact aggregates (L22 exact
  * percentiles, L35 skew p99, distinct counts): `approx_count_distinct`
  * (HLL++) must track the exact distinct count within ~3x its configured
  * relative standard deviation, and `approx_percentile` must land within
  * its documented rank-error bound of the exact interpolated percentile.
  * These bounds are what make "switch to approx_*" a real migration path
  * rather than a hand-wave: the SCALE.md residual-limit rows cite this
  * spec.
  */
class SketchParitySpec extends SparkSuite {
  import spark.implicits._

  // deterministic skewed data: 50k rows, ~5k distinct keys, zipf-ish
  private def lcg(s: Long): Long =
    s * 6364136223846793005L + 1442695040888963407L
  private val rows: Seq[(Long, Double)] = (0 until 50000).map { i =>
    val h = math.abs(lcg(i.toLong))
    // key frequency skew: low keys appear far more often
    val key = (h % 100 match {
      case m if m < 50 => h % 100          // hot keys
      case _           => h % 5000         // long tail
    })
    (key, (math.abs(lcg(h)) % 1000000) / 100.0)
  }

  test("approx_count_distinct tracks exact within 3x configured rsd") {
    val df = rows.toDF("key", "value")
    val (exact, approx) = df.agg(
        countDistinct($"key").cast("double"),
        approx_count_distinct($"key", rsd = 0.02).cast("double"))
      .as[(Double, Double)].head()
    val relErr = math.abs(approx - exact) / exact
    assert(relErr <= 0.06,
      s"HLL++ rsd=0.02 gave relative error $relErr (exact=$exact approx=$approx)")
  }

  test("approx_percentile lands within its rank-error bound of exact") {
    val df = rows.toDF("key", "value")
    val accuracy = 10000   // documented bound: rank error <= n/accuracy
    val ps = Seq(0.5, 0.9, 0.99)
    val got = df.agg(
        percentile_approx($"value", typedLit(ps), lit(accuracy)).as("a"),
        expr(s"percentile(value, array(${ps.mkString(",")}))").as("e"))
      .select($"a", $"e").as[(Seq[Double], Seq[Double])].head()
    val sorted = rows.map(_._2).sorted
    val n = sorted.length
    ps.indices.foreach { i =>
      val approxRank = sorted.indexWhere(_ >= got._1(i))
      val exactRank = math.round(ps(i) * (n - 1)).toInt
      val rankErr = math.abs(approxRank - exactRank)
      assert(rankErr <= 2 * n / accuracy + 1,
        s"p=${ps(i)}: rank error $rankErr exceeds bound (approx=${got._1(i)} exact=${got._2(i)})")
    }
  }
}
