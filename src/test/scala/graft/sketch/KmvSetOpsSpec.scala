package graft.sketch

import graft.SparkSuite

class KmvSetOpsSpec extends SparkSuite {
  import spark.implicits._

  test("small sets: estimates collapse to exact counts, rho counts " +
    "the true overlap") {
    // |A| = 6, |B| = 6, overlap 3 -> union 9; k = 256 >> 9 so every
    // estimate is exact and rho/k_used is the true Jaccard 3/9
    val a = (1 to 6).map(i => s"v$i").toDF("v")
    val b = (4 to 9).map(i => s"v$i").toDF("v")
    val r = Sketches.kmvSetOps(a, b, "v").head()
    assert(r.getAs[Long]("k_used") == 9L)
    assert(r.getAs[Double]("est_a") == 6.0)
    assert(r.getAs[Double]("est_b") == 6.0)
    assert(r.getAs[Double]("est_union") == 9.0)
    assert(r.getAs[Long]("rho") == 3L)
    assert(r.getAs[Double]("jaccard_est") == 0.3333)
    assert(r.getAs[Double]("est_intersection") == 3.0)
  }

  test("large sets: estimates land within 3/sqrt(k) of exact") {
    val a = (1 to 4000).map(i => s"x$i").toDF("v")
    val b = (2001 to 6000).map(i => s"x$i").toDF("v")
    val r = Sketches.kmvSetOps(a, b, "v", k = 256).head()
    val tol = 3.0 / math.sqrt(256) // ~0.1875 relative
    assert(math.abs(r.getAs[Double]("est_union") - 6000) / 6000 < tol)
    assert(math.abs(r.getAs[Double]("jaccard_est") - 2000.0 / 6000)
      < tol)
  }

  test("disjoint sets: rho 0, jaccard 0") {
    val a = (1 to 50).map(i => s"a$i").toDF("v")
    val b = (1 to 50).map(i => s"b$i").toDF("v")
    val r = Sketches.kmvSetOps(a, b, "v").head()
    assert(r.getAs[Long]("rho") == 0L)
    assert(r.getAs[Double]("jaccard_est") == 0.0)
  }
}
