package graft.ml

import graft.SparkSuite

class EbShrinkageSpec extends SparkSuite {
  import spark.implicits._

  test("ebBetaBinomial: small units shrink to the prior, big units " +
    "keep their rate") {
    // many units at rate ~0.5 with n=20; one 1/1 unit
    val base = (1 to 40).flatMap { u =>
      (1 to 20).map(i => (u.toLong, if ((u + i) % 2 == 0) 1 else 0))
    }
    val tiny = Seq((999L, 1))
    val r = Scorecard.ebBetaBinomial((base ++ tiny).toDF("u", "x"),
      "u", "x").collect().map(x => x.getLong(0) -> x).toMap
    val t = r(999L)
    assert(t.getAs[Double]("raw_rate") == 1.0)
    // posterior pulled well below 1 toward the ~0.5 prior
    assert(t.getAs[Double]("posterior") < 0.8)
    val big = r(1L)
    assert(math.abs(big.getAs[Double]("posterior") -
      big.getAs[Double]("raw_rate")) < 0.2)
  }

  test("ebBetaBinomial: degenerate zero-variance prior falls back " +
    "to the raw rate with null alpha/beta") {
    val df = (1L to 5L).flatMap(u => Seq((u, 1), (u, 0)))
      .toDF("u", "x")
    val r = Scorecard.ebBetaBinomial(df, "u", "x").head()
    assert(r.isNullAt(r.fieldIndex("alpha")))
    assert(r.getAs[Double]("posterior") == r.getAs[Double]("raw_rate"))
  }
}
