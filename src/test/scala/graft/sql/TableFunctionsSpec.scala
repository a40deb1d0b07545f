package graft.sql

import graft.SparkSuite

/** Imperative TVF registration on a plain session (no extensions) —
  * the path Verify and existing deployments use. */
class TableFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("graft_exact_dedup TVF matches the Scala operator") {
    TableFunctions.register(spark)
    val docs = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "cc"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_docs")
    val viaSql = spark.sql(
      "SELECT doc_id FROM graft_exact_dedup('tvf_docs', 'doc_id', 'text')")
      .as[Long].collect().sorted.toSeq
    val viaScala = graft.dedup.Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaSql == Seq(1L, 2L, 4L))
    assert(viaSql == viaScala)
  }

  test("graft_asof TVF: backward as-of through SQL") {
    TableFunctions.register(spark)
    Seq((1L, "2024-01-01 00:00:05"), (1L, "2024-01-01 00:00:20"))
      .toDF("k", "ts_s")
      .selectExpr("k", "cast(ts_s as timestamp) as ts")
      .createOrReplaceTempView("tvf_left")
    Seq((1L, "2024-01-01 00:00:00", 10.0), (1L, "2024-01-01 00:00:10", 20.0))
      .toDF("k", "ts_s", "px")
      .selectExpr("k", "cast(ts_s as timestamp) as ts", "px")
      .createOrReplaceTempView("tvf_right")
    val r = spark.sql(
      """SELECT k, ts, px FROM graft_asof('tvf_left', 'tvf_right',
        |                                 'k', 'ts', 'px')
        |ORDER BY ts""".stripMargin)
      .selectExpr("px").as[Double].collect().toSeq
    assert(r == Seq(10.0, 20.0))
  }

  test("non-literal or wrong-arity TVF args fail with the contract " +
    "message") {
    TableFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_sessions('x', 'ts')").collect()
    }
    assert(e.getMessage.contains("expects 5 arguments"))
  }
}
