package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.streaming.EventStream.{Event, FunnelOut, KalmanEstimate, KalmanObs, Upsert}

/** Checkpoint-restart parity for the stateful streams RestartParitySpec
  * does not cover (round-13 task 3): funnelStream, kalmanStream,
  * latestByKeyStream, session_window aggregation, and the stream-stream
  * attribution join. Every test puts state that SPANS the kill point —
  * a funnel mid-sequence, a Kalman mid-settle, a session mid-gap, a
  * buffered join row — so the post-restart emission is impossible
  * unless the state store restored the pre-kill walk. The memory sink
  * cannot recover from a checkpoint; foreachBatch (the production
  * shape) collects emissions across restarts. */
class StreamRestartSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnelStream: a stage-3 reach whose stage-1/2 history predates " +
    "the restart emits only from restored state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ck = Files.createTempDirectory("graft-ck-funnel-restart").toString
    val in = MemoryStream[Event]
    val got = mutable.ArrayBuffer.empty[(Long, Int, String)]
    def runOnce(): Unit = {
      val q = EventStream.funnelStream(in.toDS(),
        Seq("signup", "click", "buy"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[FunnelOut], _: Long) =>
            { got ++= b.collect().map(f => (f.user_id, f.stage_idx, f.stage)); () }
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    in.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "signup", 0.0),
      Event(2, ts("2024-01-01 10:01:00"), 7, "click", 0.0))
    runOnce()
    assert(got.toSet == Set((7L, 1, "signup"), (7L, 2, "click")))
    got.clear()
    // kill + resume: the buy event alone cannot emit stage 3 (prevOk
    // needs the RESTORED stage-2 reach time)
    in.addData(Event(3, ts("2024-01-01 10:02:00"), 7, "buy", 0.0))
    runOnce()
    assert(got.toSeq == Seq((7L, 3, "buy")))
  }

  test("kalmanStream: killed mid-settle + resumed == unbroken, " +
    "emission for emission") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pre = (1 to 3).map(i =>
      KalmanObs("k", ts(s"2024-01-01 10:00:0$i"), i, Seq(10.0, 12.0, 11.0)(i - 1)))
    val post = Seq(KalmanObs("k", ts("2024-01-01 10:00:04"), 4, 13.0))

    def killedAndResumed(): Seq[(Long, Double, Double, Option[Double])] = {
      val ck = Files.createTempDirectory("graft-ck-kalman-restart").toString
      val in = MemoryStream[KalmanObs]
      val got = mutable.ArrayBuffer.empty[(Long, Double, Double, Option[Double])]
      def runOnce(): Unit = { // each call = a fresh query on the same ck
        val q = EventStream.kalmanStream(in.toDS(), qVar = 0.01, rVar = 1.0)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ck)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[KalmanEstimate], _: Long) =>
              { got ++= b.collect().map(e =>
                  (e.n, e.level, e.level_var, e.gain)); () }
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      in.addData(pre)
      runOnce()
      in.addData(post)
      runOnce()
      got.toSeq.sortBy(_._1)
    }
    // both runs restart the query object; the "unbroken" reference is
    // the same inputs in ONE query lifetime
    val ckU = Files.createTempDirectory("graft-ck-kalman-unbroken").toString
    val inU = MemoryStream[KalmanObs]
    val gotU = mutable.ArrayBuffer.empty[(Long, Double, Double, Option[Double])]
    val qU = EventStream.kalmanStream(inU.toDS(), qVar = 0.01, rVar = 1.0)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckU)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[KalmanEstimate], _: Long) =>
          { gotU ++= b.collect().map(e => (e.n, e.level, e.level_var, e.gain)); () }
      }
      .start()
    inU.addData(pre); qU.processAllAvailable()
    inU.addData(post); qU.processAllAvailable()
    qU.stop()

    val resumed = killedAndResumed()
    assert(resumed == gotU.toSeq.sortBy(_._1))
    // the post-restart emission is the CUMULATIVE 4th step — a fresh
    // walk would restart at n = 1 with level = 13.0 exactly
    val last = resumed.last
    assert(last._1 == 4L && last._2 != 13.0 && last._4.isDefined)
  }

  test("latestByKeyStream: an older version arriving after the restart " +
    "re-emits the restored pre-kill winner") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ck = Files.createTempDirectory("graft-ck-latest-restart").toString
    val in = MemoryStream[Upsert]
    val got = mutable.ArrayBuffer.empty[(Long, Long, String)]
    def runOnce(): Unit = {
      val q = EventStream.latestByKeyStream(in.toDS())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ck)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[Upsert], _: Long) =>
            { got ++= b.collect().map(u => (u.key, u.version, u.payload)); () }
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    in.addData(Upsert(1L, 5L, "a"))
    runOnce()
    assert(got.toSeq == Seq((1L, 5L, "a")))
    got.clear()
    // a FRESH state would emit (1, 3, "b") — stale-version resurrection
    in.addData(Upsert(1L, 3L, "b"))
    runOnce()
    assert(got.toSeq == Seq((1L, 5L, "a")))
  }

  test("session_window: a session whose events straddle the kill emits " +
    "as ONE merged session after restart") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ck = Files.createTempDirectory("graft-ck-session-restart").toString
    val in = MemoryStream[Event]
    val got = mutable.ArrayBuffer.empty[(Long, Timestamp, Timestamp, Long)]
    def runOnce(): Unit = {
      val q = EventStream.sessionWindowStream(in.toDF(), "10 seconds",
        "0 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            { got ++= b.collect().map(r => (r.getLong(0), r.getTimestamp(1),
                r.getTimestamp(2), r.getLong(3))); () }
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    in.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:00:05"), 7, "click", 1.0))
    runOnce()
    assert(got.isEmpty) // session still open at the kill point
    // resume: one more event INSIDE the gap extends the restored open
    // session; flush events advance the watermark past its end
    in.addData(Event(3, ts("2024-01-01 10:00:08"), 7, "click", 1.0))
    runOnce()
    in.addData(Event(98, ts("2024-01-01 10:30:00"), 9, "flush", 0.0))
    runOnce()
    in.addData(Event(99, ts("2024-01-01 10:31:00"), 9, "flush", 0.0))
    runOnce()
    val u7 = got.filter(_._1 == 7L)
    // 3 events, one session: 10:00:00 .. 10:00:18 — a lost state store
    // would fragment it (2 + 1) or drop the pre-kill rows entirely
    assert(u7 == Seq((7L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:00:18"), 3L)))
  }

  test("attribution join: a point buffered before the kill joins an " +
    "anchor arriving after the restart") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ck = Files.createTempDirectory("graft-ck-attr-restart").toString
    val anchors = MemoryStream[(Long, Timestamp, Long)]
    val points = MemoryStream[(Long, Timestamp, Long)]
    val got = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    def runOnce(): Unit = {
      val aDf = anchors.toDF().toDF("user_id", "a_ts", "a_id")
      val pDf = points.toDF().toDF("user_id", "p_ts", "p_id")
      val q = EventStream.attributionJoinStream(aDf, pDf, "user_id",
        "a_ts", "p_ts", windowSec = 60L,
        anchorWatermark = "0 seconds", pointWatermark = "0 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            { got ++= b.collect().map(r => (r.getAs[Long]("user_id"),
                r.getAs[Long]("a_id"), r.getAs[Long]("p_id"))); () }
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    // the click arrives and is BUFFERED in join state; no anchor yet
    points.addData((7L, ts("2024-01-01 10:00:00"), 501L))
    runOnce()
    assert(got.isEmpty)
    // resume: the purchase 30 s later can only pair with the click if
    // the buffered point survived the restart
    anchors.addData((7L, ts("2024-01-01 10:00:30"), 901L))
    runOnce()
    assert(got.toSeq == Seq((7L, 901L, 501L)))
  }
}
