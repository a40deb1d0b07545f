package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

class CdcStreamSpec extends SparkSuite {
  import graft.streaming.EventStream.{CdcEntry, CdcOut}

  test("cdcApplyStream: tombstone at max version marks key deleted; " +
    "batch-twin parity on the final state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[CdcEntry]
    val q = EventStream.cdcApplyStream(in.toDS())
      .writeStream.format("memory").queryName("cdc_apply")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-cdcapply").toString)
      .start()
    // k1: insert then delete; k2: delete arrives BEFORE a newer update
    // (out of order) — the update must win; k3: plain insert
    in.addData(CdcEntry(1L, 1L, "a", "I"), CdcEntry(1L, 2L, "", "D"),
      CdcEntry(2L, 2L, "", "D"))
    q.processAllAvailable()
    in.addData(CdcEntry(2L, 3L, "y", "U"), CdcEntry(3L, 1L, "c", "I"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cdc_apply").as[CdcOut].collect().toSeq
    val finalState = rows.groupBy(_.key)
      .map { case (k, rs) => k -> rs.maxBy(_.version) }
    assert(finalState(1L) == CdcOut(1L, 2L, "", deleted = true))
    assert(finalState(2L) == CdcOut(2L, 3L, "y", deleted = false))
    assert(finalState(3L) == CdcOut(3L, 1L, "c", deleted = false))

    // batch twin on the same log: surviving keys must agree (the
    // streaming deleted=true rows are exactly the keys the batch twin
    // drops)
    val log = Seq(
      (1L, 1L, 1L, "I", "a"), (1L, 2L, 2L, "D", ""),
      (2L, 2L, 2L, "D", ""), (2L, 3L, 3L, "U", "y"),
      (3L, 1L, 1L, "I", "c"))
      .toDF("k", "t", "tie", "op", "v")
    val batch = graft.events.Cdc
      .applyLog(log, "k", "t", "tie", "op", Seq("v"), "D")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(batch.keySet ==
      finalState.filterNot(_._2.deleted).keySet)
    assert(batch(2L) == "y" && batch(3L) == "c")
  }

  test("cdcApplyStream: same-version same-payload U-vs-D tie resolves " +
    "identically regardless of delivery order") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def run(entries: Seq[CdcEntry], name: String): CdcOut = {
      val in = MemoryStream[CdcEntry]
      val q = EventStream.cdcApplyStream(in.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft-ck-$name").toString)
        .start()
      // deliver one entry per batch so arrival order is real
      entries.foreach { e => in.addData(e); q.processAllAvailable() }
      q.stop()
      // update-mode memory sink appends per batch in order; the final
      // state for the key is the LAST emitted row
      spark.table(name).as[CdcOut].collect().last
    }

    val ud = Seq(CdcEntry(1L, 5L, "x", "U"), CdcEntry(1L, 5L, "x", "D"))
    val a = run(ud, "cdc_tie_ud")
    val b = run(ud.reverse, "cdc_tie_du")
    // op participates in the fold's total order, so both deliveries
    // resolve to the same winner ("U" > "D" lexicographically)
    assert(a == b)
    assert(!a.deleted)
  }
}
