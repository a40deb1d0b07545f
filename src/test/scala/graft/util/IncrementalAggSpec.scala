package graft.util

import graft.SparkSuite

class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  private val full = Seq(("a", 1L), ("a", 5L), ("a", 3L), ("b", 10L),
    ("b", 2L), ("c", 7L)).toDF("g", "v")

  test("merge of any split equals the from-scratch state") {
    val direct = IncrementalAgg.state(full, Seq("g"), "v").collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    for (cut <- Seq(1, 3, 5)) {
      val rows = full.collect()
      val a = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.take(cut).toSeq), full.schema)
      val b = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.drop(cut).toSeq), full.schema)
      val merged = IncrementalAgg.merge(
        Seq(IncrementalAgg.state(a, Seq("g"), "v"),
          IncrementalAgg.state(b, Seq("g"), "v")), Seq("g"))
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(merged == direct, s"split at $cut")
    }
  }

  test("keys present in only one slice merge correctly") {
    val a = Seq(("x", 1L)).toDF("g", "v")
    val b = Seq(("y", 2L), ("y", 4L)).toDF("g", "v")
    val got = IncrementalAgg.merge(
      Seq(IncrementalAgg.state(a, Seq("g"), "v"),
        IncrementalAgg.state(b, Seq("g"), "v")), Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("sum"),
          r.getAs[Long]("min"), r.getAs[Long]("max")))).toMap
    assert(got("x") == ((1L, 1L, 1L, 1L)))
    assert(got("y") == ((2L, 6L, 2L, 4L)))
  }

  test("finalize derives avg from the merged state") {
    val st = IncrementalAgg.state(full, Seq("g"), "v")
    val fin = IncrementalAgg.finalizeState(st).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("avg")).toMap
    assert(fin("a") == 3.0)
    assert(fin("b") == 6.0)
  }

  test("three-way merge is associative with the two-way path") {
    val slices = Seq(
      Seq(("a", 1L)), Seq(("a", 5L), ("b", 10L)),
      Seq(("a", 3L), ("b", 2L), ("c", 7L)))
      .map(_.toDF("g", "v"))
    val threeWay = IncrementalAgg.merge(
      slices.map(IncrementalAgg.state(_, Seq("g"), "v")), Seq("g"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val direct = IncrementalAgg.state(full, Seq("g"), "v").collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(threeWay == direct)
  }
}
