package graft.report

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ExpectationsSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.0), "ok"),
    (2L, Some(-5.0), "ok"),
    (3L, None, "bad"),
    (3L, Some(3.0), "ok")
  ).toDF("id", "v", "status")

  test("evaluate: one pass, nulls count as violations") {
    val got = Expectations.evaluate(df, Seq(
        Expectations.Rule("v_nonneg", col("v") >= 0),
        Expectations.Rule("status_ok", col("status") === "ok")))
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // v_nonneg: -5 fails, null v fails -> 2 of 4.
    assert(got("v_nonneg") == ((4L, 2L, 0.5, false)))
    assert(got("status_ok") == ((4L, 1L, 0.25, false)))
  }

  test("evaluate: passing rule reports zero failures") {
    val got = Expectations.evaluate(df,
        Seq(Expectations.Rule("id_positive", col("id") > 0)))
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(got == (("id_positive", 4L, 0L, 0.0, true)))
  }

  test("uniqueness: counts rows in excess of one per key") {
    val got = Expectations.uniqueness(df, Seq("id"), "id_unique")
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(got == (("id_unique", 4L, 1L, 0.25, false)))
  }
}
