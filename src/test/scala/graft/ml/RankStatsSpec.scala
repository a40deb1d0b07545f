package graft.ml

import graft.SparkSuite

class RankStatsSpec extends SparkSuite {
  import spark.implicits._

  /** Fractional ranks (ties -> mean of spanned row numbers). */
  private def fracRanks(xs: Seq[Double]): Seq[Double] = {
    val sorted = xs.sorted
    val rankOf = xs.distinct.map { v =>
      val first = sorted.indexOf(v) + 1
      val cnt = sorted.count(_ == v)
      v -> (first + (first + cnt - 1)) / 2.0
    }.toMap
    xs.map(rankOf)
  }

  private def pearson(a: Seq[Double], b: Seq[Double]): Double = {
    val n = a.length
    val ma = a.sum / n; val mb = b.sum / n
    val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val va = a.map(x => (x - ma) * (x - ma)).sum
    val vb = b.map(y => (y - mb) * (y - mb)).sum
    cov / math.sqrt(va * vb)
  }

  test("spearman: perfect monotone = 1, reversed = -1") {
    val up = (1 to 20).map(i => ("g", i.toDouble, i * i * 1.0)).toDF("g", "x", "y")
    assert(RankStats.spearman(up, "g", "x", "y")
      .select("spearman").as[Double].head() == 1.0)
    val down = (1 to 20).map(i => ("g", i.toDouble, -math.exp(i / 3.0)))
      .toDF("g", "x", "y")
    assert(RankStats.spearman(down, "g", "x", "y")
      .select("spearman").as[Double].head() == -1.0)
  }

  test("spearman with ties matches the fractional-rank reference") {
    val xs = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 5.0, 5.0, 8.0)
    val ys = Seq(3.0, 1.0, 4.0, 4.0, 2.0, 9.0, 6.0, 6.0)
    val df = xs.zip(ys).map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val got = RankStats.spearman(df, "g", "x", "y")
      .select("spearman").as[Double].head()
    val want = pearson(fracRanks(xs), fracRanks(ys))
    assert(got == BigDecimal(want).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("spearman groups independently; n<2 gives null") {
    val df = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 1.0),
      ("b", 1.0, 1.0)).toDF("g", "x", "y")
    val rows = RankStats.spearman(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)))).toMap
    assert(rows("a")._1 == 3L && rows("a")._2.isDefined)
    assert(rows("b") == (1L, None))
  }

  test("autocorr matches brute-force paired correlation per lag") {
    val xs = Seq(5.0, 7.0, 6.0, 9.0, 4.0, 8.0, 10.0, 3.0, 7.0, 6.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("k", "t", "v")
    val got = RankStats.autocorr(df, "k", "t", "v", Seq(1, 2, 3))
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    for (k <- 1 to 3) {
      val cur = xs.drop(k); val prev = xs.dropRight(k)
      val want = BigDecimal(pearson(cur, prev))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(k)._1 == xs.length - k)
      assert(got(k)._2 == want, s"lag $k")
    }
  }

  test("autocorr: constant series has undefined (null) acf") {
    val df = (0 until 8).map(i => ("k", i, 5.0)).toDF("k", "t", "v")
    val rows = RankStats.autocorr(df, "k", "t", "v", Seq(1))
      .select("acf").collect()
    assert(rows.length == 1 && rows.head.isNullAt(0))
  }
}
