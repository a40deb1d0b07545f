package graft.join

import graft.SparkSuite

class SpatialJoinSpec extends SparkSuite {
  import spark.implicits._

  test("nearestWithinRadius matches brute force on random points") {
    val rnd = new scala.util.Random(5)
    val lefts = (1L to 60L).map(i => (i, rnd.nextDouble() * 50, rnd.nextDouble() * 50))
    val rights = (101L to 120L).map(i => (i, rnd.nextDouble() * 50, rnd.nextDouble() * 50))
    val r = 6.0
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = lefts.flatMap { case (li, lx, ly) =>
      val cands = rights.map { case (ri, rx, ry) =>
        (r6(math.sqrt((lx - rx) * (lx - rx) + (ly - ry) * (ly - ry))), ri)
      }.filter(_._1 <= r)
      if (cands.isEmpty) None else {
        val (d, ri) = cands.min
        Some((li, ri, d))
      }
    }.sortBy(_._1)
    val got = SpatialJoin.nearestWithinRadius(
        lefts.toDF("id", "x", "y"), rights.toDF("id", "x", "y"),
        "id", "id", "x", "y", "x", "y", r)
      .orderBy("left_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("neighbor in an adjacent cell is found; beyond radius is not") {
    // cell size 2: (1.9, 0.1) and (2.1, 0.1) straddle a cell boundary,
    // 0.2 apart; (9.0, 0.1) is out of everyone's radius
    val l = Seq((1L, 1.9, 0.1), (2L, 9.0, 0.1)).toDF("id", "x", "y")
    val rr = Seq((10L, 2.1, 0.1)).toDF("id", "x", "y")
    val got = SpatialJoin.nearestWithinRadius(l, rr,
        "id", "id", "x", "y", "x", "y", 2.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10L, 0.2)))
  }

  test("equidistant neighbors break ties on the lower right id") {
    val l = Seq((1L, 0.0, 0.0)).toDF("id", "x", "y")
    val rr = Seq((20L, 1.0, 0.0), (10L, -1.0, 0.0)).toDF("id", "x", "y")
    val got = SpatialJoin.nearestWithinRadius(l, rr,
        "id", "id", "x", "y", "x", "y", 2.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10L, 1.0)))
  }
}
