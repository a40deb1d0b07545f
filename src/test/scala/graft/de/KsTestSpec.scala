package graft.de

import graft.SparkSuite

class KsTestSpec extends SparkSuite {
  import spark.implicits._

  /** Brute-force two-sample D: max over all observed values of
    * |F_a(v) − F_b(v)| with right-continuous ECDFs. */
  private def refD(as: Seq[Double], bs: Seq[Double]): Double = {
    val pts = (as ++ bs).distinct
    pts.map { v =>
      math.abs(as.count(_ <= v).toDouble / as.size -
        bs.count(_ <= v).toDouble / bs.size)
    }.max
  }

  test("ksTest matches the brute-force ECDF gap, ties included") {
    val as = Seq(1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 7.0)
    val bs = Seq(2.0, 4.0, 4.0, 4.0, 6.0, 8.0)
    val df = (as.map(("g", "a", _)) ++ bs.map(("g", "b", _)))
      .toDF("g", "s", "v")
    val row = RankStats.ksTest(df, "g", "s", "v", "a", "b").head()
    assert(row.getAs[Long]("n_a") == 7 && row.getAs[Long]("n_b") == 6)
    val want = BigDecimal(refD(as, bs)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("ks_d") == want)
  }

  test("identical samples give D = 0; disjoint supports give D = 1") {
    val same = (1 to 10).flatMap(i =>
      Seq(("g", "a", i.toDouble), ("g", "b", i.toDouble))).toDF("g", "s", "v")
    assert(RankStats.ksTest(same, "g", "s", "v", "a", "b")
      .head().getAs[Double]("ks_d") == 0.0)
    val disjoint = ((1 to 5).map(i => ("g", "a", i.toDouble)) ++
      (11 to 15).map(i => ("g", "b", i.toDouble))).toDF("g", "s", "v")
    assert(RankStats.ksTest(disjoint, "g", "s", "v", "a", "b")
      .head().getAs[Double]("ks_d") == 1.0)
  }

  test("single-class group yields null D; other samples are ignored") {
    val df = Seq(("g1", "a", 1.0), ("g1", "a", 2.0),
      ("g2", "a", 1.0), ("g2", "b", 2.0), ("g2", "c", 99.0))
      .toDF("g", "s", "v")
    val out = RankStats.ksTest(df, "g", "s", "v", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").isNullAt(out("g1").fieldIndex("ks_d")))
    // g2: one a at 1, one b at 2 -> D = 1; the 'c' row must not count
    assert(out("g2").getAs[Long]("n_b") == 1)
    assert(out("g2").getAs[Double]("ks_d") == 1.0)
  }

  test("property: matches brute force on hash-derived samples") {
    val as = (1 to 40).map(i => ((i * 2654435761L) % 17).toDouble)
    val bs = (1 to 30).map(i => ((i * 40503L) % 19).toDouble)
    val df = (as.map(("g", "a", _)) ++ bs.map(("g", "b", _)))
      .toDF("g", "s", "v")
    val got = RankStats.ksTest(df, "g", "s", "v", "a", "b")
      .head().getAs[Double]("ks_d")
    val want = BigDecimal(refD(as, bs)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == want)
  }
}
