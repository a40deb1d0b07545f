package graft.prep

import graft.SparkSuite

class IpfSpec extends SparkSuite {
  import spark.implicits._

  test("rake: uniform seed converges to the rank-1 margin product") {
    // 2x2 uniform seed, row targets (2,2), col targets (1,3)
    // -> w = [[.5, 1.5], [.5, 1.5]]
    val cells = Seq(("r1", "c1", 1.0), ("r1", "c2", 1.0),
      ("r2", "c1", 1.0), ("r2", "c2", 1.0)).toDF("r", "c", "w")
    val rt = Seq(("r1", 2.0), ("r2", 2.0)).toDF("r", "target")
    val ct = Seq(("c1", 1.0), ("c2", 3.0)).toDF("c", "target")
    val out = Ipf.rake(cells, "r", "c", "w", rt, ct)
    val got = out.collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        x.getAs[Double]("weight")).toMap
    assert(got(("r1", "c1")) == 0.5 && got(("r1", "c2")) == 1.5)
    assert(got(("r2", "c1")) == 0.5 && got(("r2", "c2")) == 1.5)
    assert(out.head().getAs[Double]("max_rel_err") == 0.0)
  }

  test("rake: skewed seed still hits both margins; mismatched totals " +
    "rejected") {
    val cells = Seq(("r1", "c1", 10.0), ("r1", "c2", 1.0),
      ("r2", "c1", 1.0), ("r2", "c2", 10.0)).toDF("r", "c", "w")
    val rt = Seq(("r1", 3.0), ("r2", 5.0)).toDF("r", "target")
    val ct = Seq(("c1", 4.0), ("c2", 4.0)).toDF("c", "target")
    val out = Ipf.rake(cells, "r", "c", "w", rt, ct, iters = 30)
    assert(out.head().getAs[Double]("max_rel_err") < 1e-5)
    val colSums = out.groupBy("c").sum("weight").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(colSums("c1") - 4.0) < 1e-4)
    intercept[IllegalArgumentException] {
      Ipf.rake(cells, "r", "c", "w", rt,
        Seq(("c1", 9.0), ("c2", 4.0)).toDF("c", "target"))
    }
  }
}
