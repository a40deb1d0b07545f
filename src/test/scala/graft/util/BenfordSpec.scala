package graft.util

import graft.SparkSuite

class BenfordSpec extends SparkSuite {
  import spark.implicits._

  test("first digit extraction: sub-unit values, boundaries, exclusions") {
    val df = Seq(123.45, 0.0042, 999.999, 0.105, 7.0, -5.0, 0.0)
      .toDF("v")
    val out = Profile.benfordFirstDigit(df, "v")
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("n")).toMap
    // -5 and 0 excluded; digits: 1 (123.45), 4 (0.0042), 9 (999.999),
    // 1 (0.105), 7 (7.0)
    assert(out == Map(1 -> 2L, 4 -> 1L, 9 -> 1L, 7 -> 1L))
  }

  test("shares sum to ~1 and benford_p matches log10(1+1/d)") {
    val df = (1 to 900).map(i => i.toDouble).toDF("v")
    val rows = Profile.benfordFirstDigit(df, "v").collect()
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val d = r.getInt(0)
      val want = BigDecimal(math.log10(1 + 1.0 / d)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("benford_p") == want)
    }
  }

  test("a genuinely Benford-ish set (powers) deviates less than uniform") {
    // 2^k spans magnitudes -> near-Benford; uniform 100..199 is all 1s
    val powers = (1 to 200).map(k => math.pow(2, k % 40 + 1)).toDF("v")
    val uniform = (100 to 199).map(_.toDouble).toDF("v")
    def maxDev(df: org.apache.spark.sql.DataFrame) =
      Profile.benfordFirstDigit(df, "v").collect()
        .map(r => math.abs(r.getAs[Double]("deviation"))).max
    assert(maxDev(powers) < maxDev(uniform))
  }
}
