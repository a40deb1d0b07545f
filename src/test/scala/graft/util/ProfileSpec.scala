package graft.util

import graft.SparkSuite

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profile: nulls, exact distincts, typed ranges, column order") {
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, Some(4.5), Some("a")),
      (3L, None, Some("a")),
      (4L, Some(2.5), None)
    ).toDF("id", "x", "s")
    val got = Profile.profile(df)
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])].collect()
    assert(got.map(_._1).toSeq == Seq("id", "x", "s"), "input column order")
    val byCol = got.map(r => r._1 -> r).toMap
    assert(byCol("id") == (("id", 4L, 0L, 4L, Some(1.0), Some(4.0), None, None)))
    assert(byCol("x") == (("x", 4L, 1L, 2L, Some(2.5), Some(4.5), None, None)))
    assert(byCol("s") == (("s", 4L, 1L, 2L, None, None, Some("a"), Some("b"))))
  }

  test("profile: explicit column subset and non-profilable types") {
    val df = Seq((1L, Seq(1, 2)), (2L, Seq(3))).toDF("id", "arr")
    val got = Profile.profile(df, Seq("arr"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])].collect()
    assert(got.length == 1)
    val r = got.head
    // counts profile; ranges null for array types
    assert(r._1 == "arr" && r._2 == 2L && r._3 == 0L && r._4 == 2L)
    assert(r._5.isEmpty && r._7.isEmpty)
  }

  test("equiWidthHistogram: exact integral bins, max lands in last bin") {
    // values 0..9 in 5 bins over span 10: bin = v·5/10 → pairs
    val df = (0L to 9L).toDF("v")
    val got = Profile.equiWidthHistogram(df, "v", 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 0L, 1L), (1L, 2L, 2L, 3L),
      (2L, 2L, 4L, 5L), (3L, 2L, 6L, 7L), (4L, 2L, 8L, 9L)))
  }

  test("equiWidthHistogram: skewed values leave empty bins absent") {
    val df = Seq(0L, 1L, 100L).toDF("v")
    val got = Profile.equiWidthHistogram(df, "v", 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // span 101, width 10.1: 0,1 → bin 0; 100 → floor(1000/101)=9
    assert(got == Seq((0L, 2L, 0L, 1L), (9L, 1L, 100L, 100L)))
  }
}
