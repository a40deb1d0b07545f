package graft.sketch

import graft.SparkSuite

class HllSpec extends SparkSuite {
  import spark.implicits._

  test("estimate lands within the expected HLL error band") {
    val n = 20000
    val df = (1 to n).map(i => ("g", i.toLong)).toDF("g", "v")
    val r = Sketches.hllDistinct(df, "g", "v").collect().head
    assert(r.getAs[Long]("exact_distinct") == n.toLong)
    val est = r.getAs[Double]("hll_est")
    // 1.04/sqrt(256) ≈ 6.5% expected; allow 4 sigma
    assert(math.abs(est - n) / n < 0.26, s"est $est vs $n")
  }

  test("duplicates do not move the sketch (max-merge semantics)") {
    val base = (1 to 500).map(i => ("g", i.toLong))
    val dup = base ++ base ++ base
    val a = Sketches.hllDistinct(base.toDF("g", "v"), "g", "v")
      .collect().head
    val b = Sketches.hllDistinct(dup.toDF("g", "v"), "g", "v")
      .collect().head
    assert(a.getAs[Double]("hll_est") == b.getAs[Double]("hll_est"))
    assert(b.getAs[Long]("exact_distinct") == 500L)
  }

  test("small cardinalities take the linear-counting branch and are " +
    "near-exact") {
    val df = (1 to 30).map(i => ("g", i.toLong)).toDF("g", "v")
    val r = Sketches.hllDistinct(df, "g", "v").collect().head
    val est = r.getAs[Double]("hll_est")
    assert(math.abs(est - 30.0) < 3.0, s"est $est")
  }

  test("groups sketch independently") {
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 1000).map(i => ("b", i.toLong))).toDF("g", "v")
    val m = Sketches.hllDistinct(df, "g", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hll_est")).toMap
    assert(m("a") < m("b"))
  }
}
