package graft.join

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (7L, ts("2024-01-01 10:00:00"), 101L, 1.0),
    (7L, ts("2024-01-01 10:05:00"), 102L, 2.0),
    (7L, ts("2024-01-01 10:10:00"), 103L, 3.0),
    (8L, ts("2024-01-01 09:00:00"), 201L, 9.0)
  ).toDF("k", "t", "q_id", "q_val")

  private lazy val trades = Seq(
    (7L, ts("2024-01-01 09:59:59"), 1L),   // before any quote
    (7L, ts("2024-01-01 10:05:00"), 2L),   // exactly at quote 102
    (7L, ts("2024-01-01 10:07:00"), 3L),   // between 102 and 103
    (7L, ts("2024-01-01 11:00:00"), 4L),   // after all quotes
    (8L, ts("2024-01-01 10:00:00"), 5L),   // other key
    (9L, ts("2024-01-01 10:00:00"), 6L)    // key with no quotes
  ).toDF("k", "t", "trade_id")

  private def run(strict: Boolean) =
    AsOfJoin.asOfBackward(trades, quotes, "k", "t",
        payload = Seq("q_id", "q_val"), strict = strict)
      .select("trade_id", "q_id")
      .as[(Long, Option[Long])].collect().toMap

  test("inclusive backward as-of picks the latest right row at or before") {
    assert(run(strict = false) == Map(
      1L -> None, 2L -> Some(102L), 3L -> Some(102L), 4L -> Some(103L),
      5L -> Some(201L), 6L -> None))
  }

  test("strict mode hides the simultaneous right row") {
    assert(run(strict = true)(2L) == Some(101L))
  }

  test("matches the declarative non-equi join + argmax on random data") {
    val n = 500
    val left = spark.range(n).select(
      (col("id") % 13).as("k"),
      to_timestamp(lit("2024-01-01 00:00:00")).cast("long")
        .plus(pmod(col("id") * 7919, lit(100000))).cast("timestamp").as("t"),
      col("id").as("lid"))
    val right = spark.range(200).select(
      (col("id") % 13).as("k"),
      to_timestamp(lit("2024-01-01 00:00:00")).cast("long")
        .plus(pmod(col("id") * 104729, lit(100000))).cast("timestamp").as("t"),
      col("id").as("r_id"))
    // (k, t) collisions on the right would make the declarative argmax
    // ambiguous; this generator produces none (verified), so no tiebreak.
    assert(right.groupBy("k", "t").count().filter(col("count") > 1).count() == 0)

    val got = AsOfJoin.asOfBackward(left, right, "k", "t", Seq("r_id"))
      .select("lid", "r_id").as[(Long, Option[Long])].collect().toMap

    val oracle = left.as("l")
      .join(right.as("r"),
        col("l.k") === col("r.k") && col("l.t") >= col("r.t"), "left_outer")
      .groupBy(col("lid"))
      .agg(max_by(col("r_id"), struct(col("r.t"), col("r_id"))).as("r_id"))
      .as[(Long, Option[Long])].collect().toMap

    assert(got == oracle)
    assert(got.size == n)
  }

  test("equal-time right rows resolve by the tie-break column") {
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 11L),
      (1L, ts("2024-01-01 10:00:00"), 12L)).toDF("k", "t", "r_id")
    val l = Seq((1L, ts("2024-01-01 10:01:00"), 1L)).toDF("k", "t", "lid")
    val got = AsOfJoin.asOfBackward(l, r, "k", "t", Seq("r_id"),
        rightTieBreak = Some("r_id"))
      .select("r_id").as[Long].collect()
    assert(got.toSeq == Seq(12L))   // largest tie-break wins
  }

  test("forward as-of picks the earliest right row at or after") {
    val got = AsOfJoin.asOfForward(trades, quotes, "k", "t",
        payload = Seq("q_id", "q_val"))
      .select("trade_id", "q_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(
      1L -> Some(101L),   // 09:59:59 -> next quote 10:00:00
      2L -> Some(102L),   // exactly at 10:05 quote (inclusive)
      3L -> Some(103L), 4L -> None, 5L -> None, 6L -> None))
  }

  test("forward strict mode skips the simultaneous right row") {
    val got = AsOfJoin.asOfForward(trades, quotes, "k", "t",
        payload = Seq("q_id"), strict = true)
      .select("trade_id", "q_id").as[(Long, Option[Long])].collect().toMap
    assert(got(2L) == Some(103L))
  }

  test("forward matches the declarative non-equi join + argmin on random data") {
    val n = 500
    val left = spark.range(n).select(
      (col("id") % 13).as("k"),
      to_timestamp(lit("2024-01-01 00:00:00")).cast("long")
        .plus(pmod(col("id") * 7919, lit(100000))).cast("timestamp").as("t"),
      col("id").as("lid"))
    val right = spark.range(200).select(
      (col("id") % 13).as("k"),
      to_timestamp(lit("2024-01-01 00:00:00")).cast("long")
        .plus(pmod(col("id") * 104729, lit(100000))).cast("timestamp").as("t"),
      col("id").as("r_id"))
    assert(right.groupBy("k", "t").count().filter(col("count") > 1).count() == 0)

    val got = AsOfJoin.asOfForward(left, right, "k", "t", Seq("r_id"))
      .select("lid", "r_id").as[(Long, Option[Long])].collect().toMap
    val oracle = left.as("l")
      .join(right.as("r"),
        col("l.k") === col("r.k") && col("l.t") <= col("r.t"), "left_outer")
      .groupBy(col("lid"))
      .agg(min_by(col("r_id"), struct(col("r.t"), col("r_id"))).as("r_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == oracle)
  }

  test("tolerance nulls out stale matches, both directions") {
    // trade 4 at 11:00 is 50 min after quote 103 (10:10): a 10-min
    // tolerance voids it; trade 3 (2 min after quote 102) survives
    val back = AsOfJoin.asOfBackward(trades, quotes, "k", "t",
        payload = Seq("q_id"), toleranceSec = Some(600))
      .select("trade_id", "q_id").as[(Long, Option[Long])].collect().toMap
    assert(back(3L) == Some(102L) && back(4L).isEmpty)
    // forward: trade 1 at 09:59:59 is 1s before quote 101 -> survives a
    // 10s tolerance; trade 6 has no quotes at all -> still None
    val fwd = AsOfJoin.asOfForward(trades, quotes, "k", "t",
        payload = Seq("q_id"), toleranceSec = Some(10))
      .select("trade_id", "q_id").as[(Long, Option[Long])].collect().toMap
    assert(fwd(1L) == Some(101L) && fwd(2L) == Some(102L))
    assert(fwd(3L).isEmpty && fwd(6L).isEmpty)   // 103 is 3 min past trade 3
  }

  test("non-numeric tie-break columns keep their native ordering") {
    // a string tie-break must not be silently cast-to-null (which would
    // surrender the documented determinism to partition order)
    val r = Seq((1L, ts("2024-01-01 10:00:00"), "uuid-a", 11L),
      (1L, ts("2024-01-01 10:00:00"), "uuid-b", 12L))
      .toDF("k", "t", "r_uuid", "r_id")
    val l = Seq((1L, ts("2024-01-01 10:01:00"), 1L)).toDF("k", "t", "lid")
    val got = AsOfJoin.asOfBackward(l, r, "k", "t", Seq("r_id"),
        rightTieBreak = Some("r_uuid"))
      .select("r_id").as[Long].collect()
    assert(got.toSeq == Seq(12L))   // "uuid-b" > "uuid-a" lexicographically
  }

  test("null keys and times follow join semantics: never matched") {
    // right rows with null key/time are invisible; left rows with a
    // null TIME are DROPPED (fuzz-37 contract: a null-instant probe
    // cannot ask "as of when?", and DuckDB's native ASOF hands it an
    // arbitrary match); null-KEY left rows match nothing but survive
    // (left-outer)
    val r = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 11L),
      (Option.empty[Long], Some(ts("2024-01-01 09:00:00")), 12L),
      (Some(1L), Option.empty[Timestamp], 13L)
    ).toDF("k", "t", "r_id")
    val l = Seq(
      (Some(1L), Some(ts("2024-01-01 11:00:00")), 1L),
      (Some(1L), Option.empty[Timestamp], 2L),
      (Option.empty[Long], Some(ts("2024-01-01 11:00:00")), 3L)
    ).toDF("k", "t", "lid")
    for (fwd <- Seq(false, true)) {
      val f = if (fwd)
        AsOfJoin.asOfForward(l, r, "k", "t", Seq("r_id"))
      else AsOfJoin.asOfBackward(l, r, "k", "t", Seq("r_id"))
      val got = f.select("lid", "r_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(got.size == 2,
        s"null-time left row dropped, the rest kept (fwd=$fwd)")
      assert(!got.contains(2L), s"fwd=$fwd")
      assert(got(1L) == (if (fwd) None else Some(11L)))
      assert(got(3L).isEmpty, s"fwd=$fwd")
    }
  }

  test("payload name collisions are rejected") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(trades, quotes.withColumnRenamed("q_id", "trade_id"),
        "k", "t", Seq("trade_id"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
