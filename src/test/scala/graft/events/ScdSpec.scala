package graft.events

import graft.SparkSuite

class ScdSpec extends SparkSuite {
  import spark.implicits._

  test("scd2: runs collapse, versions sequence, current row open-ended") {
    // u1: A(1,2) -> B(3) -> A(4,5): three runs even though A recurs.
    // u2: single run.
    val log = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "A"),
      (1L, 5L, "A"),
      (2L, 1L, "X")
    ).toDF("k", "t", "v")
    val got = Scd.scd2(log, "k", "t", "v")
      .as[(Long, String, Long, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got == Set(
      (1L, "A", 1L, 1L, Some(3L), false),
      (1L, "B", 2L, 3L, Some(4L), false),
      (1L, "A", 3L, 4L, None, true),
      (2L, "X", 1L, 1L, None, true)))
  }

  test("scd2: leading null run gets version 1, null-safe run breaks") {
    val log = Seq(
      (1L, 1L, None), (1L, 2L, None), (1L, 3L, Some("A")),
      (1L, 4L, None)
    ).toDF("k", "t", "v")
    val got = Scd.scd2(log, "k", "t", "v")
      .as[(Long, Option[String], Long, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got == Set(
      (1L, None, 1L, 1L, Some(3L), false),
      (1L, Some("A"), 2L, 3L, Some(4L), false),
      (1L, None, 3L, 4L, None, true)))
  }

  test("scd2: tie-break pins equal timestamps") {
    val log = Seq((1L, 1L, 10L, "A"), (1L, 1L, 11L, "B"))
      .toDF("k", "t", "seq", "v")
    val got = Scd.scd2(log, "k", "t", "v", tieBreak = Seq("seq"))
      .select("v", "version").as[(String, Long)].collect().toSet
    assert(got == Set(("A", 1L), ("B", 2L)))
  }
}
