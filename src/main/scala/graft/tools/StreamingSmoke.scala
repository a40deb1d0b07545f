package graft.tools

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream
import graft.streaming.EventStream.{CdcEntry, Event}

/** Throughput smoke for the Structured Streaming twins: drives each
  * stateful operator with a deterministic MemoryStream event feed
  * (default 200k events in 20 micro-batches) into a noop sink and
  * reports wall seconds + rows/sec per operator. The point is a
  * NUMBER next to the streaming claims in SCALE.md — state size and
  * parity are pinned by the EventStream specs; this measures that the
  * state machinery keeps up at micro-batch granularity. Results are
  * indicative single-process local[*] figures, not cluster numbers.
  *
  * Run: sbt "runMain graft.tools.StreamingSmoke [nEvents] [op,op]" */
object StreamingSmoke {

  private def lcg(seed: Long): Long =
    seed * 6364136223846793005L + 1442695040888963407L

  private val types = Array("view", "click", "signup", "purchase", "error")

  private def event(id: Long, nUsers: Long): Event = {
    val h = math.abs(lcg(id * 2654435761L))
    // timestamps advance with id so watermarks move and state evicts
    val tsMicros = 1704067200000000L + id * 500000L // 0.5 s apart
    Event(id, new Timestamp(tsMicros / 1000), h % nUsers,
      types((math.abs(lcg(id * 31 + 1)) % types.length).toInt),
      (h % 10000) / 100.0)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").map(_.trim).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val nUsers = math.max(2L, n / 100)
    val nBatches = 20
    val perBatch = (n / nBatches).toInt

    def drive(name: String, mode: String = "update")(
        build: MemoryStream[Event]
        => org.apache.spark.sql.DataFrame): (String, Double) = {
      val in = MemoryStream[Event]
      val q = build(in).writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft-smk-$name").toString)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      val t0 = System.nanoTime()
      var b = 0
      while (b < nBatches) {
        val lo = b.toLong * perBatch
        in.addData((lo until lo + perBatch).map(event(_, nUsers)))
        q.processAllAvailable()
        b += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      name -> sec
    }

    val ops: Seq[(String, () => (String, Double))] = Seq(
      "tumbling_counts" -> (() => drive("tumbling_counts")(in =>
        EventStream.tumblingCounts(in.toDF(), "1 minute", "5 minutes"))),
      "sliding_counts" -> (() => drive("sliding_counts")(in =>
        EventStream.slidingCounts(in.toDF(), "2 minutes", "1 minute",
          "5 minutes"))),
      "dedup_watermark" -> (() => drive("dedup_watermark")(in =>
        EventStream.dedupWithinWatermark(in.toDF(), "5 minutes"))),
      // session-window aggregation only supports append output
      "session_window" -> (() => drive("session_window", "append")(in =>
        EventStream.sessionWindowStream(in.toDF(), "30 seconds",
          "5 minutes"))),
      // flatMapGroupsWithState(Append) operators require append output
      "sessionize_state" -> (() => drive("sessionize_state", "append")(in =>
        EventStream.sessionize(in.toDS(), gapSeconds = 30L,
          watermark = "5 minutes").toDF())),
      "funnel_state" -> (() => drive("funnel_state", "append")(in =>
        EventStream.funnelStream(in.toDS(),
          Seq("signup", "click", "purchase")).toDF())),
      "cdc_apply" -> (() => drive("cdc_apply")(in =>
        EventStream.cdcApplyStream(
          in.toDS().map(e => CdcEntry(e.user_id, e.event_id,
            e.event_type, if (e.event_type == "error") "D" else "U")))
          .toDF())),
      // monitor-per-user SPRT: state is 3 numbers + flag per key
      "sprt_state" -> (() => drive("sprt_state", "append")(in =>
        EventStream.sprtStream(
          in.toDS().map(e => EventStream.SprtObs(
            (e.user_id % 1000).toString, e.ts, e.event_id,
            if (e.event_id % 3 == 0) 1 else 0)),
          p0 = 0.30, p1 = 0.36).toDF())))

    val timed = ops
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (_, run) => run() }
    val json = timed.map { case (name, sec) =>
      f"""{"op": "$name", "sec": $sec%.2f, "rows_per_sec": ${n / sec}%.0f}"""
    }.mkString(", ")
    println(s"""{"streaming_smoke": {"events": $n, "batches": $nBatches, "ops": [$json]}}""")
    spark.stop()
  }
}
