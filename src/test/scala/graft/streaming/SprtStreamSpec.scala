package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.streaming.EventStream.SprtObs

class SprtStreamSpec extends SparkSuite {

  private def ts(i: Int) =
    Timestamp.valueOf(f"2024-01-01 10:00:${i % 60}%02d.${i}%06d")

  private def run(in: MemoryStream[SprtObs], name: String): Unit = {
    val q = EventStream.sprtStream(in.toDS(), p0 = 0.5, p1 = 0.9)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-ck-$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("sprtStream: emits the decision exactly once, at the same " +
    "index as the batch twin, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 10 successes for key 'up' (crosses H1 at 6), split across
    // batches 4 + 6; 'down' gets failures (crosses H0 at 2)
    val in = MemoryStream[SprtObs]
    in.addData((1 to 4).map(i => SprtObs("up", ts(i), i, 1)) ++
      Seq(SprtObs("down", ts(1), 1, 0)))
    run(in, "sprt1")
    in.addData((5 to 10).map(i => SprtObs("up", ts(i), i, 1)) ++
      Seq(SprtObs("down", ts(2), 2, 0)))
    run(in, "sprt1")
    val out = spark.sql("select * from sprt1").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 2)
    assert(out("up").getString(1) == "accept_h1")
    assert(out("up").getLong(2) == 6L)
    assert(out("down").getString(1) == "accept_h0")
    assert(out("down").getLong(2) == 2L)
    // batch twin agrees on both decisions and indices
    val batch = graft.de.Experiment.sprtBernoulli(
      ((1 to 10).map(i => ("up", i, 1)) ++
        (1 to 2).map(i => ("down", i, 0)))
        .toDF("g", "i", "x"),
      "g", Seq("i"), "x", p0 = 0.5, p1 = 0.9)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(batch("up").getAs[String]("decision") == "accept_h1")
    assert(batch("up").getAs[Long]("n_decision") == 6L)
    assert(batch("down").getAs[Long]("n_decision") == 2L)
  }

  test("sprtStream: post-decision observations stay silent; an " +
    "undecided walk emits nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SprtObs]
    in.addData((1 to 8).map(i => SprtObs("k", ts(i), i, 1)))
    run(in, "sprt2")
    // more data after the (index 6) decision: no second emission
    in.addData((9 to 20).map(i => SprtObs("k", ts(i), i, 0)))
    in.addData(Seq(SprtObs("quiet", ts(1), 1, 1),
      SprtObs("quiet", ts(2), 2, 0)))
    run(in, "sprt2")
    val rows = spark.sql("select * from sprt2").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "k")
    assert(rows.head.getLong(2) == 6L)
  }
}
