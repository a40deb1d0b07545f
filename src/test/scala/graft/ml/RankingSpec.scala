package graft.ml

import graft.SparkSuite

class RankingSpec extends SparkSuite {
  import spark.implicits._

  test("prCurve: hand-computed three-threshold case") {
    // scores .9(+), .5(-), .5(+), .1(-)
    val df = Seq((1L, 0.9), (0L, 0.5), (1L, 0.5), (0L, 0.1))
      .toDF("y", "s")
    val rows = Ranking.prCurve(df, "y", "s").collect()
      .map(r => r.getDouble(0) -> r).toMap
    // t=.9: pred 1, tp 1, P 1, R .5
    assert(rows(0.9).getAs[Double]("precision") == 1.0)
    assert(rows(0.9).getAs[Double]("recall") == 0.5)
    // t=.5: pred 3, tp 2, P 2/3, R 1
    assert(rows(0.5).getAs[Double]("precision") == 0.6667)
    assert(rows(0.5).getAs[Double]("recall") == 1.0)
    // AP = (.5-0)*1 + (1-.5)*(2/3) + (1-1)*.5 = .8333
    assert(rows(0.1).getAs[Double]("avg_precision") == 0.8333)
  }

  test("prCurve: perfect ranking has AP 1") {
    val df = Seq((1L, 0.9), (1L, 0.8), (0L, 0.2), (0L, 0.1))
      .toDF("y", "s")
    val ap = Ranking.prCurve(df, "y", "s").collect()
      .head.getAs[Double]("avg_precision")
    assert(ap == 1.0)
  }

  test("liftTable: perfect separation captures everything in the top " +
    "bins; lift tops at 1/base-rate") {
    // 100 rows, 20 positives with the highest scores, 5 bins
    val df = (1 to 100).map(i =>
      (if (i <= 20) 1L else 0L, 1000.0 - i, i.toLong))
      .toDF("y", "s", "k")
    val rows = Ranking.liftTable(df, "y", "s", "k", nBins = 5)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(rows(1L).getAs[Long]("n_pos") == 20L)
    assert(rows(1L).getAs[Double]("cum_capture") == 1.0)
    assert(rows(1L).getAs[Double]("cum_lift") == 5.0)   // 1 / 0.2
    assert(rows(5L).getAs[Double]("cum_lift") == 1.0)
    assert(rows.values.map(_.getAs[Long]("n_rows")).sum == 100L)
  }

  test("liftTable: uniform outcomes give lift ~1 everywhere") {
    val df = (1 to 100).map(i => ((i % 2).toLong, (i * 37 % 101).toDouble,
      i.toLong)).toDF("y", "s", "k")
    val rows = Ranking.liftTable(df, "y", "s", "k", nBins = 4).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("cum_lift") - 1.0) < 0.25)
    }
  }
}
