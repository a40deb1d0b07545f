package graft.ml

import graft.SparkSuite

class PcaSpec extends SparkSuite {
  import spark.implicits._

  test("topComponent recovers the dominant axis of anisotropic data") {
    // points spread along (1, 1)/√2 with small orthogonal noise — the
    // first PC must align with the diagonal, sign-fixed positive
    val rnd = new scala.util.Random(3)
    val pts = (0L until 200L).map { i =>
      val t = rnd.nextGaussian() * 10
      val o = rnd.nextGaussian() * 0.1
      (i, Array((t + o).toFloat, (t - o).toFloat))
    }
    val got = Pca.topComponent(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val inv = math.sqrt(0.5)
    assert(math.abs(got(0)._2 - inv) < 1e-3 &&
      math.abs(got(1)._2 - inv) < 1e-3)
    // eigenvalue ≈ variance along the diagonal ≈ 2·var(t)·0.5·2 = 2σ²·…
    assert(got(0)._3 > 100) // σ=10 ⇒ leading eigenvalue ~200
  }

  test("sign convention: largest-|loading| dimension is positive") {
    // variance concentrated on dim 1 with negative correlation to dim 0:
    // whatever the iteration produces, loading(1) must end positive
    val rnd = new scala.util.Random(9)
    val pts = (0L until 100L).map { i =>
      val t = rnd.nextGaussian()
      (i, Array((-t * 0.3).toFloat, (t * 2).toFloat))
    }
    val got = Pca.topComponent(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(got(1)._2 > 0 && got(0)._2 < 0)
  }

  test("loadings are unit-norm") {
    val rnd = new scala.util.Random(1)
    val pts = (0L until 50L).map(i =>
      (i, Array.fill(5)(rnd.nextGaussian().toFloat)))
    val got = Pca.topComponent(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .as[(Long, Double, Double)].collect()
    val nrm = math.sqrt(got.map(r => r._2 * r._2).sum)
    assert(math.abs(nrm - 1.0) < 1e-4)
  }
}
