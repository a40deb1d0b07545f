package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSuite

/** Pins the co-located-join scale lever SURVEY/SCALE claim: two tables
  * bucketed on the join key plan a sort-merge join with NO shuffle
  * exchange on either side — at 100 TB this is the difference between
  * re-shuffling the fact table per join and reading pre-placed buckets.
  */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_scores")
    (0L until 1000L).map(i => (i, s"text$i")).toDF("doc_id", "text")
      .write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_docs")
    (0L until 1000L by 2).map(i => (i, i * 0.5)).toDF("doc_id", "score")
      .write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_scores")

    // disable auto-broadcast so the join would OTHERWISE shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_docs").join(spark.table("b_scores"), "doc_id")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join must not shuffle, found: ${exchanges.map(_.nodeName)}")
      assert(joined.count() == 500)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_scores")
    }
  }

  test("incremental dedup's anti join reads a bucketed hash history without exchanging it") {
    // Pins SCALE.md's L32 claim: with the accumulated content_md5 set
    // stored bucketed on the hash, the per-ingest anti join never
    // re-shuffles the history — only the (much smaller) ingest batch
    // moves. The history side must plan ZERO ShuffleExchange.
    import org.apache.spark.sql.functions.{col, md5}
    spark.sql("DROP TABLE IF EXISTS b_seen")
    (0L until 500L).map(i => s"historic doc $i").toDF("text")
      .select(md5(col("text")).as("content_md5"))
      .write.bucketBy(8, "content_md5").sortBy("content_md5")
      .saveAsTable("b_seen")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batch = (Seq((1L, "historic doc 7"), (2L, "historic doc 7")) ++
        Seq((3L, "fresh doc"), (4L, "fresh doc"), (5L, "another fresh")))
        .toDF("doc_id", "text")
      val out = graft.dedup.Dedup.incrementalExactDedup(
        batch, "doc_id", "text", spark.table("b_seen"))
      // history side arrives pre-placed: every shuffle in the plan must
      // originate from the batch/aggregate side, never from b_seen's scan
      val plan = out.queryExecution.executedPlan
      val shuffledScans = plan.collect {
        case e: ShuffleExchangeExec
            if e.toString.contains("b_seen") => e
      }
      assert(shuffledScans.isEmpty,
        s"bucketed history must not re-shuffle: ${shuffledScans.map(_.nodeName)}")
      val kept = out.select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq == Seq(3L, 5L))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_seen")
    }
  }
}
