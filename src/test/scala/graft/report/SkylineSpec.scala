package graft.report

import graft.SparkSuite

class SkylineSpec extends SparkSuite {
  import spark.implicits._

  private def bruteSkyline(pts: Seq[(Double, Double)]): Set[(Double, Double)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (a, b) =>
        a <= x && b <= y && (a < x || b < y)
      }
    }.toSet

  test("skyline2d matches the brute-force dominance filter") {
    val pts = Seq((1.0, 9.0), (2.0, 7.0), (2.0, 8.0), (3.0, 7.0),
      (4.0, 3.0), (5.0, 5.0), (6.0, 2.0), (6.0, 2.5), (9.0, 1.0))
    val df = pts.zipWithIndex.map { case ((x, y), i) => (i, x, y) }
      .toDF("id", "x", "y")
    val got = Skyline.skyline2d(df, "x", "y")
      .select("x", "y").as[(Double, Double)].collect().toSet
    assert(got == bruteSkyline(pts))
  }

  test("duplicates of a skyline point are all kept") {
    val df = Seq((1, 1.0, 5.0), (2, 1.0, 5.0), (3, 2.0, 1.0))
      .toDF("id", "x", "y")
    val ids = Skyline.skyline2d(df, "x", "y")
      .select("id").as[Int].collect().sorted
    assert(ids.toSeq == Seq(1, 2, 3))
  }

  test("equal-x points: only the min-y survives; equal-y across x: " +
    "only the min-x survives") {
    val df = Seq((1, 1.0, 5.0), (2, 1.0, 4.0), (3, 2.0, 4.0))
      .toDF("id", "x", "y")
    val ids = Skyline.skyline2d(df, "x", "y")
      .select("id").as[Int].collect().toSeq
    assert(ids == Seq(2))
  }

  test("localPrefilter keeps a superset of the skyline and composes") {
    val pts = (1 to 200).map { i =>
      val x = ((i * 2654435761L) % 97).toDouble
      val y = ((i * 40503L) % 89).toDouble
      (i, x, y)
    }
    val df = pts.toDF("id", "x", "y").repartition(7)
    val pre = Skyline.localPrefilter(df, "x", "y")
    val direct = Skyline.skyline2d(df, "x", "y")
      .select("id").as[Int].collect().toSet
    val viaPre = Skyline.skyline2d(pre, "x", "y")
      .select("id").as[Int].collect().toSet
    val preIds = pre.select("id").as[Int].collect().toSet
    assert(direct.subsetOf(preIds))
    assert(viaPre == direct)
  }

  test("property: random points match brute force") {
    val pts = (1 to 300).map { i =>
      (((i * 48271L) % 31).toDouble, ((i * 16807L) % 37).toDouble)
    }
    val df = pts.zipWithIndex.map { case ((x, y), i) => (i, x, y) }
      .toDF("id", "x", "y")
    val got = Skyline.skyline2d(df, "x", "y")
      .select("x", "y").as[(Double, Double)].collect().toSet
    assert(got == bruteSkyline(pts))
  }
}
