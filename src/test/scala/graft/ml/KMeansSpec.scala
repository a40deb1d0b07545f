package graft.ml

import graft.SparkSuite

class KMeansSpec extends SparkSuite {
  import spark.implicits._

  test("lloydStats converges to the obvious 2-cluster split") {
    // two tight 2-D blobs around (0,0) and (10,10); seeds = ids 1,2 (one
    // per blob), so one round already lands the natural clustering
    val pts = Seq(
      (1L, Array(0.0f, 0.1f)), (3L, Array(0.2f, 0.0f)),
      (5L, Array(0.1f, 0.2f)),
      (2L, Array(10.0f, 10.1f)), (4L, Array(9.9f, 10.0f)))
      .toDF("vec_id", "embedding")
    val got = KMeans.lloydStats(pts, "vec_id", "embedding",
        k = 2, iters = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((0L, 3L), (1L, 2L)))
    // inertia is small: every point within ~0.15 of its centroid
    assert(got.forall(_._3 < 0.2))
  }

  test("lloydStats matches a driver-side reference with the same rounding") {
    val rnd = new scala.util.Random(11)
    val pts = (0L until 40L).map { i =>
      val cx = if (i % 3 == 0) 0.0 else if (i % 3 == 1) 5.0 else -4.0
      (i, Array(cx + rnd.nextGaussian(), cx / 2 + rnd.nextGaussian())
        .map(_.toFloat))
    }
    val k = 3; val iters = 3
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vs = pts.map { case (i, a) => i -> a.map(_.toDouble) }.toMap
    var cent = pts.sortBy(_._1).take(k).zipWithIndex
      .map { case ((_, a), c) => c.toLong -> a.map(_.toDouble) }.toMap
    def d(a: Array[Double], b: Array[Double]) =
      r9(math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum))
    def asg = vs.map { case (i, e) =>
      i -> cent.toSeq.map { case (c, ce) => (d(e, ce), c) }.min }
    (1 to iters).foreach { _ =>
      val a = asg
      cent = cent.map { case (c, old) =>
        val members = vs.collect { case (i, e) if a(i)._2 == c => e }
        c -> (if (members.isEmpty) old
              else (0 until 2).map(j =>
                r6(members.map(_(j)).sum / members.size)).toArray)
      }
    }
    val fin = asg
    val expected = fin.values.groupBy(_._2).map { case (c, ds) =>
      (c, ds.size.toLong,
        BigDecimal(ds.map(x => x._1 * x._1).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = KMeans.lloydStats(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k, iters)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }
}
