package graft.graph

import graft.SparkSuite

class CutSpec extends SparkSuite {
  import spark.implicits._

  private def arts(edges: Seq[(String, String)]): Map[String, (Long, Boolean)] =
    Cut.articulationPoints(edges.toDF("s", "d"), "s", "d").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("components_if_removed"),
          r.getAs[Boolean]("is_articulation"))).toMap

  private def brs(edges: Seq[(String, String)]): Map[(String, String), Boolean] =
    Cut.bridgeEdges(edges.toDF("s", "d"), "s", "d").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Boolean]("is_bridge")).toMap

  test("path graph: interior vertex is the articulation point, " +
    "every edge a bridge") {
    val path = Seq(("a", "b"), ("b", "c"))
    val a = arts(path)
    assert(a("a") == (1L, false) && a("c") == (1L, false))
    assert(a("b") == (2L, true))
    val b = brs(path)
    assert(b(("a", "b")) && b(("b", "c")))
  }

  test("cycle: no articulation points, no bridges") {
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    assert(arts(cyc).values.forall(v => v == (1L, false)))
    assert(brs(cyc).values.forall(!_))
  }

  test("barbell: the two junction vertices cut, only the bar is " +
    "a bridge") {
    val bar = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d"))
    val a = arts(bar)
    assert(a("c") == (2L, true) && a("d") == (2L, true))
    assert(Seq("a", "b", "e", "f").forall(v => a(v) == (1L, false)))
    val b = brs(bar)
    assert(b(("c", "d")))
    assert(b.count(_._2) == 1)
  }

  test("two components count correctly; removal merges nothing") {
    val two = Seq(("a", "b"), ("c", "d"), ("d", "e"))
    val a = arts(two)
    assert(a("d") == (3L, true))    // 2 comps → 3 after removing d
    assert(a("a") == (2L, false))
  }

  test("parallel, reversed, and self-loop edges collapse first") {
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "a"), ("a", "b"))
    val b = brs(messy)
    assert(b.size == 1 && b(("a", "b")))
    val a = arts(messy)
    assert(a.keySet == Set("a", "b"))
    assert(a.values.forall(v => v == (1L, false)))
  }

  test("driver-contract guard fails fast") {
    val e = Seq(("a", "b"), ("b", "c")).toDF("s", "d")
    val ex = intercept[IllegalArgumentException] {
      Cut.articulationPoints(e, "s", "d", maxDriverEdges = 1L)
    }
    assert(ex.getMessage.contains("driver-collectable"))
  }
}
