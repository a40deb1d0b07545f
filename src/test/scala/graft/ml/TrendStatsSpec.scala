package graft.ml

import graft.SparkSuite

class TrendStatsSpec extends SparkSuite {
  import spark.implicits._

  private def ref(ts: Seq[(Double, Double)]): (Long, Double) = {
    val pairs = for {
      i <- ts.indices; j <- ts.indices if ts(i)._1 < ts(j)._1
    } yield (math.signum(ts(j)._2 - ts(i)._2),
      (ts(j)._2 - ts(i)._2) / (ts(j)._1 - ts(i)._1))
    val slopes = pairs.map(_._2).sorted
    val n = slopes.length
    val med = if (n % 2 == 1) slopes(n / 2)
              else (slopes(n / 2 - 1) + slopes(n / 2)) / 2.0
    (pairs.map(_._1).sum.toLong, med)
  }

  test("monotone series: mk_s = n_pairs, theil_sen recovers the slope") {
    val df = (0 until 12).map(i => ("g", i, 10 + 3 * i)).toDF("g", "t", "x")
    val r = TrendStats.trend(df, "g", "t", "x").head()
    assert(r.getAs[Long]("n_pairs") == 66 && r.getAs[Long]("mk_s") == 66)
    assert(r.getAs[Double]("theil_sen") == 3.0)
    assert(r.getAs[Long]("n_points") == 12)
  }

  test("theil_sen shrugs off an outlier that wrecks OLS") {
    // y = 2t except one wild point; median slope stays 2
    val pts = (0 until 15).map(i => ("g", i, if (i == 7) 1000 else 2 * i))
    val r = TrendStats.trend(pts.toDF("g", "t", "x"), "g", "t", "x").head()
    assert(r.getAs[Double]("theil_sen") == 2.0)
  }

  test("matches the brute-force reference with ties and noise") {
    val xs = Seq(5, 3, 3, 8, 1, 9, 9, 2, 7, 4).map(_.toDouble)
    val ts = xs.indices.map(_.toDouble)
    val df = ts.zip(xs).map { case (t, x) => ("g", t, x) }.toDF("g", "t", "x")
    val (wantS, wantSlope) = ref(ts.zip(xs))
    val r = TrendStats.trend(df, "g", "t", "x").head()
    assert(r.getAs[Long]("mk_s") == wantS)
    assert(r.getAs[Double]("theil_sen") == BigDecimal(wantSlope)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("groups are independent; single-point keys drop out") {
    val df = Seq(("up", 0, 1), ("up", 1, 2), ("up", 2, 3),
      ("down", 0, 3), ("down", 1, 1), ("lone", 0, 5)).toDF("g", "t", "x")
    val out = TrendStats.trend(df, "g", "t", "x")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("mk_s")).toMap
    assert(out == Map("up" -> 3L, "down" -> -1L))
  }
}
