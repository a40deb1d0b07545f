package graft.events

import java.sql.Timestamp

import graft.SparkSuite

class PositionAttributionSpec extends SparkSuite {
  import spark.implicits._

  private def ev(id: Long, u: Long, t: String, tp: String) =
    (id, u, Timestamp.valueOf(t), tp)

  test("positionBased: 40/20/40 over a 4-touch journey; singletons " +
    "and pairs degrade correctly") {
    val events = Seq(
      // user 1: 4 touches then purchase -> 0.4, 0.1, 0.1, 0.4
      ev(1, 1, "2024-01-01 10:00:00", "click"),
      ev(2, 1, "2024-01-01 11:00:00", "view"),
      ev(3, 1, "2024-01-01 12:00:00", "view"),
      ev(4, 1, "2024-01-01 13:00:00", "signup"),
      ev(5, 1, "2024-01-01 14:00:00", "purchase"),
      // user 2: one touch -> full credit
      ev(6, 2, "2024-01-01 10:00:00", "view"),
      ev(7, 2, "2024-01-01 11:00:00", "purchase"),
      // user 3: two touches -> 0.5 / 0.5
      ev(8, 3, "2024-01-01 10:00:00", "click"),
      ev(9, 3, "2024-01-01 11:00:00", "signup"),
      ev(10, 3, "2024-01-01 12:00:00", "purchase"),
      // user 4: conversion with no touches -> unattributed
      ev(11, 4, "2024-01-01 12:00:00", "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = Attribution.positionBased(events, "user_id", "ts",
      "event_type", "event_id", "purchase",
      Seq("click", "view", "signup"), 86400L)
      .collect().map(x => x.getString(0) -> x).toMap
    // click: 0.4 (u1 first) + 0.5 (u3 first) = 0.9
    assert(r("click").getAs[Double]("credit") == 0.9)
    // view: 0.1 + 0.1 (u1 middles) + 1.0 (u2 single) = 1.2
    assert(r("view").getAs[Double]("credit") == 1.2)
    // signup: 0.4 (u1 last) + 0.5 (u3 last) = 0.9
    assert(r("signup").getAs[Double]("credit") == 0.9)
    assert(r("unattributed").getAs[Double]("credit") == 1.0)
    // total credit conserves: one unit per conversion
    assert(r.values.map(_.getAs[Double]("credit")).sum == 4.0)
  }
}
