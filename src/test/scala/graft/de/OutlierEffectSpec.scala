package graft.de

import graft.SparkSuite

class OutlierEffectSpec extends SparkSuite {
  import spark.implicits._

  test("grubbs: a planted spike is flagged with a tiny p; clean " +
    "normal-ish data is not") {
    val clean = (1 to 30).map(i => ("clean", 10.0 + (i % 5)))
    val spike = (1 to 30).map(i => ("spiky", 10.0 + (i % 5))) :+
      (("spiky", 500.0))
    val r = Inference.grubbs((clean ++ spike).toDF("g", "v"),
      "g", "v").collect().map(x => x.getString(0) -> x).toMap
    assert(r("spiky").getAs[Double]("outlier") == 500.0)
    assert(r("spiky").getAs[Double]("p_value") < 1e-4)
    assert(r("clean").getAs[Double]("p_value") > 0.1)
  }

  test("grubbs: n < 3 and zero-variance groups drop out") {
    val df = Seq(("two", 1.0), ("two", 2.0),
      ("flat", 3.0), ("flat", 3.0), ("flat", 3.0)).toDF("g", "v")
    assert(Inference.grubbs(df, "g", "v").count() == 0)
  }

  test("cliffsDelta: disjoint samples give |delta| = 1 large; " +
    "identical samples give 0 negligible") {
    val df = ((1 to 5).map(i => ("sep", "a", 100.0 + i)) ++
      (1 to 5).map(i => ("sep", "b", i.toDouble)) ++
      (1 to 4).map(i => ("same", "a", i.toDouble)) ++
      (1 to 4).map(i => ("same", "b", i.toDouble)))
      .toDF("s", "g", "v")
    val r = Inference.cliffsDelta(df, "s", "g", "v", "a", "b")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("sep").getAs[Double]("delta") == 1.0)
    assert(r("sep").getAs[String]("magnitude") == "large")
    assert(r("same").getAs[Double]("delta") == 0.0)
    assert(r("same").getAs[String]("magnitude") == "negligible")
  }

  test("wilcoxonSignedRank: textbook paired table with zero drop " +
    "and tie-averaged ranks") {
    // diffs: +1, +2, +3, -1, 0 -> zero dropped, n = 4
    // |d| ranks: 1->1.5(x2), 2->3, 3->4 ; W+ = 1.5 + 3 + 4 = 8.5
    val rows = Seq(("u1", 0.0, 1.0), ("u2", 0.0, 2.0),
      ("u3", 0.0, 3.0), ("u4", 1.0, 0.0), ("u5", 5.0, 5.0))
      .map { case (u, a, b) => ("c", u, a, b) }
    val r = Inference.wilcoxonSignedRank(rows.toDF("s", "u", "pre",
      "post"), "s", "pre", "post").head()
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Double]("w_plus") == 8.5)
    // sigma2 = 4*5*9/24 - (2^3-2)/48 = 7.5 - 0.125; mean = 5
    val z = (8.5 - 5.0) / math.sqrt(7.375)
    assert(r.getAs[Double]("z") == math.round(z * 1e4) / 1e4)
  }

  test("wilcoxonSignedRank: all-positive shifts give the maximal " +
    "W+ and a small p") {
    val rows = (1 to 15).map(i => ("c", i.toDouble, i + 1.0))
      .toDF("s", "pre", "post")
    val r = Inference.wilcoxonSignedRank(rows, "s", "pre", "post")
      .head()
    assert(r.getAs[Double]("w_plus") == 120.0)  // 15*16/2
    assert(r.getAs[Double]("p_value") < 0.01)
  }
}
