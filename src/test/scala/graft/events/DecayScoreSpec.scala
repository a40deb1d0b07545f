package graft.events

import graft.SparkSuite

class DecayScoreSpec extends SparkSuite {
  import spark.implicits._

  test("decayScore: one half-life halves the weight") {
    val df = Seq(
      (1L, "2024-01-31 12:00:00", 10.0),   // age 0 → weight 1
      (1L, "2024-01-24 08:00:00", 10.0),   // age 7 → weight 0.5
      (2L, "2024-01-17 00:00:00", 8.0))    // age 14 → weight 0.25
      .toDF("u", "ts", "v")
      .withColumn("ts", $"ts".cast("timestamp"))
    val r = TimeWeighted.decayScore(df, "u", "ts", "v", 7.0, "2024-01-31")
      .orderBy("u")
      .as[(Long, Long, Double, java.sql.Timestamp)].collect()
    assert(r(0)._2 == 2L && r(0)._3 == 15.0)
    assert(r(1)._3 == 2.0)
  }
}
