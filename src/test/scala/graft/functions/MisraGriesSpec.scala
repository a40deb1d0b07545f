package graft.functions

import org.apache.spark.sql.Row

import graft.SparkSuite

class MisraGriesSpec extends SparkSuite {
  import spark.implicits._

  private def hits(rows: Seq[String], k: Int): Map[String, Long] = {
    val df = rows.toDF("item").repartition(4)
    val out = df.agg(MisraGries.heavyHitters($"item", k).as("hh"))
      .head().getSeq[Row](0)
    out.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("recall guarantee: every item with freq > n/(k+1) is present") {
    // n = 1000: "a" x400, "b" x200, "c" x100, tail of 300 singletons
    val rows = Seq.fill(400)("a") ++ Seq.fill(200)("b") ++
      Seq.fill(100)("c") ++ (1 to 300).map(i => s"t$i")
    val k = 9 // threshold n/(k+1) = 100
    val got = hits(rows, k)
    assert(got.contains("a") && got.contains("b"))
    assert(got.size <= k)
  }

  test("estimate undercounts by at most n/(k+1)") {
    val rows = Seq.fill(500)("x") ++ (1 to 500).map(i => s"t${i % 50}")
    val k = 19 // error bound 1000/20 = 50
    val got = hits(rows, k)
    assert(got("x") <= 500 && got("x") >= 500 - 50)
  }

  test("k >= distinct items: exact counts regardless of partitioning") {
    val rows = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(5)("c")
    val got = hits(rows, 10)
    assert(got == Map("a" -> 7L, "b" -> 3L, "c" -> 5L))
  }

  test("output sorted by estimate desc then item; nulls ignored") {
    val df = (Seq.fill(5)("z") ++ Seq.fill(5)("a") ++ Seq.fill(2)("m") ++
      Seq(null.asInstanceOf[String])).toDF("item")
    val out = df.agg(MisraGries.heavyHitters($"item", 5).as("hh"))
      .head().getSeq[Row](0)
    val items = out.map(_.getString(0))
    assert(items == Seq("a", "z", "m"))
  }

  test("works per group in a grouped aggregate") {
    val df = (Seq.fill(10)(("g1", "x")) ++ Seq.fill(4)(("g2", "y")))
      .toDF("g", "item")
    val out = df.groupBy("g")
      .agg(MisraGries.heavyHitters($"item", 3).as("hh"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Row](1).map(h => h.getString(0)).toSeq).toMap
    assert(out("g1") == Seq("x") && out("g2") == Seq("y"))
  }
}
