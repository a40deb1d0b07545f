package graft.util

import graft.SparkSuite

class BucketingSpec extends SparkSuite {
  import spark.implicits._

  private def facts = (1 to 2000)
    .map(i => (i.toLong % 97, i.toLong, i * 1.5)).toDF("k", "id", "v")

  test("join of two co-bucketed tables plans WITHOUT a shuffle " +
    "exchange; the unbucketed join plans WITH one") {
    val dims = (0L until 97L).map(k => (k, s"name$k")).toDF("k", "name")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(facts, "b_facts", Seq("k"), 8)
      Bucketing.writeBucketed(dims, "b_dims", Seq("k"), 8)
      val bucketed = Bucketing.table(spark, "b_facts")
        .join(Bucketing.table(spark, "b_dims"), Seq("k"))
      assert(!Bucketing.hasShuffleExchange(bucketed),
        s"bucketed join should be exchange-free:\n" +
          bucketed.queryExecution.executedPlan)
      // and it still computes the right thing
      assert(bucketed.count() == 2000L)
      val plain = facts.join(dims, Seq("k"))
      assert(Bucketing.hasShuffleExchange(plain))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("groupBy on the bucket key is also exchange-free") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(facts, "b_facts2", Seq("k"), 8)
      val agg = Bucketing.table(spark, "b_facts2")
        .groupBy($"k").count()
      assert(!Bucketing.hasShuffleExchange(agg),
        agg.queryExecution.executedPlan.toString)
      assert(agg.count() == 97L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_facts2")
    }
  }
}
