package graft.events

import graft.SparkSuite

class ResampleSpec extends SparkSuite {
  import spark.implicits._

  private val daily = Seq(
    ("a", 10L, 3L, Some(1.5)),
    ("a", 13L, 2L, Some(2.5)),   // gap: days 11, 12 missing
    ("b", 5L, 1L, None)          // single day, null metric
  ).toDF("k", "day", "n", "v")

  test("denseGrid: every bucket between per-key min and max") {
    val got = Resample.denseGrid(daily, "k", "day")
      .select("k", "day").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 10L), ("a", 11L), ("a", 12L), ("a", 13L),
      ("b", 5L)))
  }

  test("regularize: zero-filled counts, forward-filled metric") {
    val got = Resample.regularize(daily, "k", "day", "n", Seq("v"))
      .select("k", "day", "n", "v")
      .as[(String, Long, Long, Option[Double])].collect().toSet
    assert(got == Set(
      ("a", 10L, 3L, Some(1.5)),
      ("a", 11L, 0L, Some(1.5)),   // generated: count 0, metric carried
      ("a", 12L, 0L, Some(1.5)),
      ("a", 13L, 2L, Some(2.5)),
      ("b", 5L, 1L, None)))        // nothing observed to carry
  }
}
