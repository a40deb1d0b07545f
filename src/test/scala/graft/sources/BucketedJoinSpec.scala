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
}
