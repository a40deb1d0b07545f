package graft.events

import graft.SparkSuite

class CdcSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("applyLog: latest value wins; trailing tombstone removes the key") {
    val log = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "I", 10.0),
      (1L, "2024-01-01 11:00:00", 2L, "U", 20.0),
      (2L, "2024-01-01 10:00:00", 3L, "I", 30.0),
      (2L, "2024-01-01 12:00:00", 4L, "D", 0.0),
      (3L, "2024-01-01 09:00:00", 5L, "I", 1.0),
      (3L, "2024-01-01 10:00:00", 6L, "D", 0.0),
      (3L, "2024-01-01 11:00:00", 7L, "I", 2.0))
      .toDF("k", "t", "id", "op", "v")
      .withColumn("t", $"t".cast("timestamp"))
    val r = Cdc.applyLog(log, "k", "t", "id", "op", Seq("v"), "D")
      .orderBy("k")
      .as[(Long, Double, Long, java.sql.Timestamp)].collect()
    // key 2 deleted; key 3 re-inserted after its tombstone
    assert(r.map(_._1).toSeq == Seq(1L, 3L))
    assert(r(0) == ((1L, 20.0, 2L, ts("2024-01-01 11:00:00"))))
    assert(r(1) == ((3L, 2.0, 3L, ts("2024-01-01 11:00:00"))))
  }

  test("applyLog: same-timestamp entries resolved by the tie column") {
    val log = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "U", 1.0),
      (1L, "2024-01-01 10:00:00", 2L, "U", 2.0))
      .toDF("k", "t", "id", "op", "v")
      .withColumn("t", $"t".cast("timestamp"))
    val r = Cdc.applyLog(log, "k", "t", "id", "op", Seq("v"), "D")
      .select("v").as[Double].head()
    assert(r == 2.0)
  }
}
