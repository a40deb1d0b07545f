package graft.events

import graft.SparkSuite

class RollingSpec extends SparkSuite {
  import spark.implicits._

  test("trailing: RANGE frame shrinks over calendar gaps") {
    // Days 1,2,3 then a gap to day 10: the day-10 frame covers days
    // 4..10 — only day 10 itself. A ROWS frame would wrongly pull in
    // days 1-3.
    val daily = Seq(
      ("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 30.0), ("k", 10L, 40.0)
    ).toDF("key", "day", "v")
    val rows = Rolling.trailing(daily, "key", "day", "v", width = 7)
      .select("day", "roll_avg", "roll_sum", "roll_min", "roll_max",
        "roll_n")
      .as[(Long, Double, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(rows(1L) == ((10.0, 10.0, 10.0, 10.0, 1L)))
    assert(rows(2L) == ((15.0, 30.0, 10.0, 20.0, 2L)))
    assert(rows(3L) == ((20.0, 60.0, 10.0, 30.0, 3L)))
    assert(rows(10L) == ((40.0, 40.0, 40.0, 40.0, 1L)))
  }

  test("trailing: frames are per-key") {
    val daily = Seq(("a", 1L, 1.0), ("b", 1L, 100.0), ("a", 2L, 3.0))
      .toDF("key", "day", "v")
    val got = Rolling.trailing(daily, "key", "day", "v", width = 7)
      .select("key", "day", "roll_sum").as[(String, Long, Double)]
      .collect().toSet
    assert(got == Set(("a", 1L, 1.0), ("a", 2L, 4.0), ("b", 1L, 100.0)))
  }
}
