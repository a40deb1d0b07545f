package graft.de

import graft.SparkSuite

class TrimmedMeanSpec extends SparkSuite {
  import spark.implicits._

  test("trimmedMean: outliers outside the band are dropped") {
    // values 1..10 plus outliers -1000, 1000; band [p10, p90] of the
    // 12 values: p10 = 0.1*11th rank positions... pin via computed
    // percentiles: sorted: -1000,1,2,...,10,1000 (n=12)
    // p10 idx = 1.1 -> between -1000... wait p10 = (n-1)*0.1 = 1.1 →
    // between sorted[1]=1 and sorted[2]=2 → 1.1; p90 idx = 9.9 →
    // between sorted[9]=9 and sorted[10]=10 → 9.9
    // kept: 2..9 (8 values), mean 5.5
    val vals = (1 to 10).map(_.toDouble) ++ Seq(-1000.0, 1000.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = RobustStats.trimmedMean(df, "g", "v", 0.1, 0.9)
      .as[(String, Long, Long, Double, Double, Double)].head()
    assert(r._2 == 12L && r._3 == 8L)
    assert(r._4 == 1.1 && r._5 == 9.9)
    assert(r._6 == 5.5)
  }

  test("trimmedMean: exact and approx dispatch agree where the cut " +
    "points are data values") {
    // n=5, p25/p75 land exactly on sorted[1]=2 and sorted[3]=4, where
    // interpolated percentile and the sketch's value-select coincide —
    // so forcing either path must give the identical frame (the
    // documented accuracy bound: sketch rank error ≪ band width)
    val df = (1 to 5).map(i => ("g", i.toDouble)).toDF("g", "v")
    val exact = RobustStats.trimmedMean(df, "g", "v", 0.25, 0.75,
      exactQuantiles = Some(true)).collect().head
    val approx = RobustStats.trimmedMean(df, "g", "v", 0.25, 0.75,
      exactQuantiles = Some(false)).collect().head
    val probed = RobustStats.trimmedMean(df, "g", "v", 0.25, 0.75)
      .collect().head
    assert(exact == approx)
    assert(exact == probed) // tiny data → the probe picks exact
    assert(exact.getAs[Double]("trimmed_mean") == 3.0)
  }
}
