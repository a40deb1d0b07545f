package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.streaming.EventStream.KalmanObs

class KalmanStreamSpec extends SparkSuite {

  private def ts(i: Int) =
    Timestamp.valueOf(f"2024-01-01 10:00:${i % 60}%02d.${i}%06d")

  private def run(in: MemoryStream[KalmanObs], name: String): Unit = {
    val q = EventStream.kalmanStream(in.toDS(), qVar = 4.0, rVar = 9.0)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-ck-$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  private val zs = Seq(10.0, 14.0, 9.0, 30.0, 12.0, 11.0, 50.0, 8.0)

  test("kalmanStream: one estimate per observation; the last row " +
    "equals the batch operator exactly, across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KalmanObs]
    // split 3 + 5 across micro-batches, plus a second key in one go
    in.addData(zs.take(3).zipWithIndex.map { case (z, i) =>
      KalmanObs("g", ts(i), i.toLong, z) })
    run(in, "kal1")
    in.addData(zs.drop(3).zipWithIndex.map { case (z, i) =>
      KalmanObs("g", ts(i + 3), (i + 3).toLong, z) } ++
      Seq(KalmanObs("h", ts(0), 0L, 42.0)))
    run(in, "kal1")
    val rows = spark.sql("select * from kal1").collect()
    val g = rows.filter(_.getString(0) == "g")
      .sortBy(_.getLong(1))
    assert(g.length == zs.length) // one estimate per observation
    assert(g.map(_.getLong(1)).toSeq == (1L to 8L))
    // gain null on the seed row only
    assert(g.head.isNullAt(4) && g.tail.forall(!_.isNullAt(4)))
    // last emitted row == batch operator row, exactly
    val batch = graft.events.Kalman.localLevel(
      zs.zipWithIndex.map { case (z, i) => ("g", i, z) }
        .toDF("k", "t", "z"), "k", "t", "z", 4.0, 9.0).head()
    val last = g.last
    assert(last.getDouble(2) == batch.getAs[Double]("level"))
    assert(last.getDouble(3) == batch.getAs[Double]("level_var"))
    assert(last.getDouble(4) == batch.getAs[Double]("gain"))
    // single-observation key: seeded, null gain
    val h = rows.filter(_.getString(0) == "h")
    assert(h.length == 1 && h.head.getDouble(2) == 42.0 &&
      h.head.isNullAt(4))
  }

  test("kalmanStream: estimates settle monotonically in variance on " +
    "a constant series (the filter converges, gain shrinks)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KalmanObs]
    in.addData((0 until 30).map(i => KalmanObs("c", ts(i), i.toLong,
      20.0)))
    run(in, "kal2")
    val vars = spark.sql("select * from kal2").collect()
      .sortBy(_.getLong(1)).map(_.getDouble(3))
    assert(vars.zip(vars.tail).forall { case (a, b) => b <= a })
    val levels = spark.sql("select * from kal2").collect()
      .map(_.getDouble(2)).distinct
    assert(levels.toSeq == Seq(20.0)) // constant input is a fixpoint
  }

  test("kalmanStream: invalid variances rejected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KalmanObs]
    intercept[IllegalArgumentException] {
      EventStream.kalmanStream(in.toDS(), qVar = -1.0, rVar = 1.0)
    }
  }
}
