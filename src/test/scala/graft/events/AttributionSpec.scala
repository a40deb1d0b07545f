package graft.events

import java.sql.Timestamp

import graft.SparkSuite

class AttributionSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("lastTouch credits the latest in-horizon touch, else unattributed") {
    val ev = Seq(
      // user 1: click then view then purchase → view (latest) wins
      (1L, 1L, ts("2024-01-05 10:00:00"), "click"),
      (2L, 1L, ts("2024-01-05 11:00:00"), "view"),
      (3L, 1L, ts("2024-01-05 12:00:00"), "purchase"),
      // user 2: only touch is OUTSIDE the 1-day lookback → unattributed
      (4L, 2L, ts("2024-01-01 09:00:00"), "click"),
      (5L, 2L, ts("2024-01-05 09:00:00"), "purchase"),
      // user 3: no touches at all → unattributed
      (6L, 3L, ts("2024-01-05 08:00:00"), "purchase"),
      // user 4: touch at EXACTLY the lookback bound (inclusive) counts
      (7L, 4L, ts("2024-01-04 07:00:00"), "click"),
      (8L, 4L, ts("2024-01-05 07:00:00"), "purchase"),
      // non-touch, non-conversion types are ignored
      (9L, 1L, ts("2024-01-05 11:30:00"), "error"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Attribution.lastTouch(ev, "user_id", "ts", "event_type",
        "event_id", "purchase", Seq("click", "view"),
        lookbackSec = 86400L)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("click", 1L), ("unattributed", 2L), ("view", 1L)))
  }

  test("linear: credit splits equally, unattributed keeps full credit") {
    val ev = Seq(
      // user 1: click + view inside the window → 0.5 each
      (1L, 1L, ts("2024-01-05 10:00:00"), "click"),
      (2L, 1L, ts("2024-01-05 11:00:00"), "view"),
      (3L, 1L, ts("2024-01-05 12:00:00"), "purchase"),
      // user 2: conversion with no in-window touch → unattributed 1.0
      (4L, 2L, ts("2024-01-01 09:00:00"), "click"),
      (5L, 2L, ts("2024-01-05 09:00:00"), "purchase"),
      // user 3: two clicks, one conversion → click credit 1.0 over 2 rows
      (6L, 3L, ts("2024-01-05 07:00:00"), "click"),
      (7L, 3L, ts("2024-01-05 08:00:00"), "click"),
      (8L, 3L, ts("2024-01-05 09:30:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Attribution.linear(ev, "user_id", "ts", "event_type",
        "event_id", "purchase", Seq("click", "view"), 86400L)
      .as[(String, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("click", 1.5, 3L),          // 0.5 (user 1) + 2·0.5 (user 3)
      ("unattributed", 1.0, 0L),
      ("view", 0.5, 1L)))
  }

  test("simultaneous touches resolve by the id tie-break") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-05 10:00:00"), "click"),
      (2L, 1L, ts("2024-01-05 10:00:00"), "view"), // same instant, higher id
      (3L, 1L, ts("2024-01-05 12:00:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Attribution.lastTouch(ev, "user_id", "ts", "event_type",
        "event_id", "purchase", Seq("click", "view"), 86400L)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("view", 1L)))
  }

  test("markovRemoval: hand-solved absorption chain") {
    // u1 A→B→conv, u2 A→drop, u3 B→conv, u4 bare conversion
    // P(START→A)=1/2, (START→B)=(START→CONV)=1/4; A→B=A→NULL=1/2;
    // B→CONV=1 → base 0.75; remove A → 0.5 (re 1/3);
    // remove B → 0.25 (re 2/3)
    val ev = Seq(
      ("u1", 1L, 1L, "A", 0), ("u1", 2L, 2L, "B", 0),
      ("u1", 3L, 3L, "P", 1),
      ("u2", 1L, 4L, "A", 0),
      ("u3", 1L, 5L, "B", 0), ("u3", 2L, 6L, "P", 1),
      ("u4", 1L, 7L, "P", 1))
      .toDF("u", "ts", "id", "ch", "cv")
    val m = Attribution.markovRemoval(ev, "u", "ts", "id", "ch", "cv")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m.keySet == Set("A", "B"))
    assert(m("A").getAs[Long]("n_transitions") == 8L)
    assert(m("A").getAs[Double]("p_conv_base") == 0.75)
    assert(m("A").getAs[Double]("p_conv_removed") == 0.5)
    assert(m("A").getAs[Double]("removal_effect") == 0.333333)
    assert(m("A").getAs[Double]("attribution_share") == 0.333333)
    assert(m("B").getAs[Double]("p_conv_removed") == 0.25)
    assert(m("B").getAs[Double]("removal_effect") == 0.666667)
    assert(m("B").getAs[Double]("attribution_share") == 0.666667)
  }

  test("markovRemoval: no conversions gives base 0 and null shares") {
    val ev = Seq(("u1", 1L, 1L, "A", 0), ("u2", 1L, 2L, "B", 0))
      .toDF("u", "ts", "id", "ch", "cv")
    val rows = Attribution.markovRemoval(ev, "u", "ts", "id", "ch",
      "cv").collect()
    assert(rows.forall(_.getAs[Double]("p_conv_base") == 0.0))
    assert(rows.forall(r =>
      r.isNullAt(r.fieldIndex("attribution_share"))))
  }
}
