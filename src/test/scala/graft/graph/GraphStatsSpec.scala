package graft.graph

import graft.SparkSuite

class GraphStatsSpec extends SparkSuite {
  import spark.implicits._

  test("reciprocity: fully bidirectional = 1, one-way = 0") {
    val bidir = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val r1 = GraphStats.summary(bidir, "src", "dst").collect().head
    assert(r1.getAs[Double]("reciprocity") == 1.0)
    assert(r1.getAs[Long]("n_edges") == 4L)
    val oneway = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val r2 = GraphStats.summary(oneway, "src", "dst").collect().head
    assert(r2.getAs[Double]("reciprocity") == 0.0)
  }

  test("star graph is maximally disassortative (r = -1)") {
    val star = Seq(("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"))
      .toDF("src", "dst")
    val r = GraphStats.summary(star, "src", "dst").collect().head
    assert(r.getAs[Double]("assortativity") == -1.0)
    assert(r.getAs[Long]("n_nodes") == 5L)
  }

  test("regular graph (cycle) has degenerate degree variance: null r") {
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val r = GraphStats.summary(cyc, "src", "dst").collect().head
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  test("self loops and duplicate arcs are excluded before counting") {
    val messy = Seq(("a", "a"), ("a", "b"), ("a", "b"), ("b", "c"))
      .toDF("src", "dst")
    val r = GraphStats.summary(messy, "src", "dst").collect().head
    assert(r.getAs[Long]("n_edges") == 2L)
    assert(r.getAs[Long]("n_nodes") == 3L)
  }

  test("two disjoint dumbbells: assortative by construction (r > 0)") {
    // two K3 triangles joined to... rather: mixed-degree chain pairs
    // path a-b-c-d-e: ends deg 1 pair with deg-2 cores → r < 0;
    // adding the closing edge makes it a cycle (all deg 2) → null.
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val r = GraphStats.summary(path, "src", "dst").collect().head
    assert(r.getAs[Double]("assortativity") < 0.0)
  }
}
