package graft.ml

import graft.SparkSuite

class ScorecardSpec extends SparkSuite {
  import spark.implicits._

  test("woeIv: hand-computed WoE and IV; zero-cell bucket nulls") {
    // bucket a: 3 pos 1 neg; bucket b: 1 pos 3 neg; bucket c: 0 pos 2 neg
    val df = (Seq.fill(3)(("a", 1)) ++ Seq(("a", 0)) ++ Seq(("b", 1)) ++
      Seq.fill(3)(("b", 0)) ++ Seq.fill(2)(("c", 0)))
      .toDF("bucket", "target")
    val r = Scorecard.woeIv(df, "bucket", "target").collect()
      .map(x => x.getString(0) -> x).toMap
    // pos shares: a 3/4, b 1/4, c 0; neg shares: a 1/6, b 3/6, c 2/6
    assert(r("a").getAs[Double]("woe") ==
      math.round(math.log((3.0 / 4) / (1.0 / 6)) * 1e6) / 1e6)
    assert(r("b").getAs[Double]("woe") ==
      math.round(math.log((1.0 / 4) / (3.0 / 6)) * 1e6) / 1e6)
    assert(r("c").isNullAt(r("c").fieldIndex("woe")))
    val iv = (3.0 / 4 - 1.0 / 6) * math.log((3.0 / 4) / (1.0 / 6)) +
      (1.0 / 4 - 3.0 / 6) * math.log((1.0 / 4) / (3.0 / 6))
    assert(r("a").getAs[Double]("iv") == math.round(iv * 1e6) / 1e6)
    assert(r("a").getAs[Double]("iv") == r("c").getAs[Double]("iv"))
  }

  test("targetEncode: shrinks rare categories toward the prior") {
    val df = (Seq.fill(100)(("big", 1.0)) ++ Seq.fill(100)(("big", 0.0))
      ++ Seq(("rare", 1.0))).toDF("cat", "y")
    val r = Scorecard.targetEncode(df, "cat", "y", m = 20.0).collect()
      .map(x => x.getString(0) -> x).toMap
    val gmean = 101.0 / 201
    // rare: raw mean 1.0 but n=1 -> (1 + 20*gmean)/21, far from 1
    val exp = (1.0 + 20 * gmean) / 21
    assert(r("rare").getAs[Double]("encoded") ==
      math.round(exp * 1e6) / 1e6)
    assert(r("rare").getAs[Double]("cat_mean") == 1.0)
    // big: n=200 dominates the prior -> encoded close to 0.5
    assert(math.abs(r("big").getAs[Double]("encoded") - 0.5) < 0.01)
  }
}
