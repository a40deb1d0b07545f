package graft.util

import graft.SparkSuite

class MergeSpec extends SparkSuite {
  import spark.implicits._

  private val target = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    .toDF("k", "name", "v")

  test("matched keys update, unmatched target rows survive, new keys " +
    "insert") {
    val source = Seq((2L, "B", 99L), (4L, "d", 40L)).toDF("k", "name", "v")
    val got = Merge.mergeInto(target, source, Seq("k")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ("a", 10L), 2L -> ("B", 99L),
      3L -> ("c", 30L), 4L -> ("d", 40L)))
  }

  test("update-to-null is honored (not reverted by coalesce)") {
    val source = Seq((2L, null.asInstanceOf[String], 99L))
      .toDF("k", "name", "v")
    val got = Merge.mergeInto(target, source, Seq("k")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(2L).isNullAt(1))
    assert(got(2L).getLong(2) == 99L)
    assert(got(1L).getString(1) == "a")
  }

  test("delete flag removes matched keys and suppresses flagged inserts") {
    val source = Seq((2L, "B", 99L, true), (4L, "d", 40L, false),
      (5L, "e", 50L, true)).toDF("k", "name", "v", "del")
    val got = Merge.mergeInto(target, source, Seq("k"),
      deleteFlagCol = Some("del")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ("a", 10L), 3L -> ("c", 30L),
      4L -> ("d", 40L)))
  }

  test("empty source is a no-op; empty target passes the source through") {
    val empty = Seq.empty[(Long, String, Long)].toDF("k", "name", "v")
    assert(Merge.mergeInto(target, empty, Seq("k")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    val got = Merge.mergeInto(empty, target, Seq("k")).collect()
    assert(got.length == 3)
  }
}
