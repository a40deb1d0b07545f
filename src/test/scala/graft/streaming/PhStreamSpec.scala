package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.streaming.EventStream.PhObs

class PhStreamSpec extends SparkSuite {

  private def ts(i: Int) =
    Timestamp.valueOf(f"2024-01-01 10:00:${i % 60}%02d.${i}%06d")

  private def run(in: MemoryStream[PhObs], name: String): Unit = {
    val q = EventStream.phStream(in.toDS(), delta = 0.0, lambda = 2.0)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-ck-$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("phStream: fires once at the first gap crossing, split " +
    "across micro-batches, and matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // flat 0s then a level shift to 10 at t5: mean walks to 2,
    // dev jumps 8 → gap 8 > λ=2 at n=5
    val xs = Seq(0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0)
    val in = MemoryStream[PhObs]
    in.addData(xs.take(3).zipWithIndex.map { case (x, i) =>
      PhObs("k", ts(i + 1), i + 1, x)
    })
    run(in, "ph1")
    in.addData(xs.drop(3).zipWithIndex.map { case (x, i) =>
      PhObs("k", ts(i + 4), i + 4, x)
    })
    run(in, "ph1")
    val out = spark.sql("select * from ph1").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "k")
    assert(out.head.getLong(1) == 5L)
    assert(out.head.getDouble(2) == 8.0)
    // batch twin alarms too, at its argmax-gap readout (t7, the gap
    // still climbing past the stream's first crossing at t5):
    // t6 ph = 8 + (10 − 20/6) = 14.6667, t7 ph = 14.6667 + (10 − 30/7)
    val batch = graft.events.Changepoint.pageHinkley(
      xs.zipWithIndex.map { case (x, i) => ("k", (i + 1).toLong, x) }
        .toDF("k", "i", "v"),
      "k", "i", "v", delta = 0.0, lambda = 2.0).head()
    assert(batch.getAs[Boolean]("alarm"))
    assert(batch.getAs[Long]("detect_at") == 7L)
    assert(batch.getAs[Double]("ph_stat") == 20.381)
  }

  test("phStream: a drift-free stream stays silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PhObs]
    in.addData((1 to 12).map(i => PhObs("k", ts(i), i, 1.0)))
    run(in, "ph2")
    assert(spark.sql("select * from ph2").isEmpty)
  }
}
