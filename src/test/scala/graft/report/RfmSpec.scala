package graft.report

import java.sql.Timestamp

import graft.SparkSuite

class RfmSpec extends SparkSuite {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  test("scores: recency/frequency/monetary computed per entity") {
    val df = Seq(
      ("a", ts(1), 100.0), ("a", ts(10), 50.0),
      ("b", ts(20), 10.0),
      ("c", ts(5), 500.0), ("c", ts(6), 500.0), ("c", ts(7), 500.0))
      .toDF("k", "t", "amt")
    val out = Rfm.scores(df, "k", "t", "amt")
      .collect().map(r => r.getString(0) -> r).toMap
    // anchor = day 20 (b's last order)
    assert(out("a").getAs[Long]("recency_days") == 10)
    assert(out("b").getAs[Long]("recency_days") == 0)
    assert(out("c").getAs[Long]("frequency") == 3)
    assert(out("c").getAs[Double]("monetary") == 1500.0)
    // b most recent -> best r_score of the three
    assert(out("b").getAs[Int]("r_score") >
      out("a").getAs[Int]("r_score"))
    // c highest frequency and monetary
    assert(out("c").getAs[Int]("f_score") == 5)
    assert(out("c").getAs[Int]("m_score") == 5)
  }

  test("quintile arithmetic: n=10 gives exactly 2 per quintile") {
    val df = (1 to 10).flatMap { i =>
      (1 to i).map(j => (f"c$i%02d", ts(j), i * 10.0))
    }.toDF("k", "t", "amt")
    val out = Rfm.scores(df, "k", "t", "amt")
    val byScore = out.groupBy("f_score").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byScore == Map(5 -> 2L, 4 -> 2L, 3 -> 2L, 2 -> 2L, 1 -> 2L))
  }

  test("windowed and distributed rank paths agree") {
    val df = (1 to 200).map { i =>
      (f"c$i%03d", ts(1 + (i * 7) % 28), ((i * 31) % 97) * 10.0)
    }.toDF("k", "t", "amt")
    val small = Rfm.scores(df, "k", "t", "amt")
      .orderBy("k").collect().toSeq
    val dist = Rfm.scores(df, "k", "t", "amt", distributedThreshold = 10L)
      .orderBy("k").collect().toSeq
    assert(small == dist)
  }

  test("segments: cells bounded, counts sum to entity count") {
    val df = (1 to 60).map { i =>
      (f"c$i%02d", ts(1 + i % 28), i * 5.0)
    }.toDF("k", "t", "amt")
    val seg = Rfm.segments(df, "k", "t", "amt").collect()
    assert(seg.map(_.getAs[Long]("n_customers")).sum == 60)
    assert(seg.forall { r =>
      (1 to 5).contains(r.getAs[Int]("r_score")) &&
        (1 to 5).contains(r.getAs[Int]("m_score"))
    })
  }
}
