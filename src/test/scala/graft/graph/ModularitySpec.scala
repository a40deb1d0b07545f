package graft.graph

import graft.SparkSuite

class ModularitySpec extends SparkSuite {
  import spark.implicits._

  // two triangles joined by one bridge edge: {1,2,3} and {4,5,6}
  private def twoTriangles = Seq((1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "d")

  test("modularity: two-community split of bridged triangles") {
    // m=7; communities A={1,2,3}, B={4,5,6}: intra 3 each,
    // degrees A = 2+2+3 = 7, B = 7
    // qc = 3/7 - (7/14)^2 = 0.428571 - 0.25 = 0.178571 (6 dp);
    // q_total is the exact sum of the EMITTED 6-dp contribs (round-15
    // snap contract): 0.178571 * 2 = 0.357142 — NOT round(2·(3/7 −
    // 1/4), 6) = 0.357143; the invariant is q_total == Σ q_contrib.
    val comm = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("node", "community")
    val r = Modularity.modularity(twoTriangles, "s", "d",
        comm, "node", "community")
      .orderBy("community")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(r.length == 2)
    assert(r(0) == (("A", 3L, 3L, 7L, 0.178571, 0.357142)))
    assert(r(1) == (("B", 3L, 3L, 7L, 0.178571, 0.357142)))
  }

  test("modularity: everything in one community scores zero") {
    val comm = (1L to 6L).map((_, "X")).toDF("node", "community")
    val r = Modularity.modularity(twoTriangles, "s", "d",
        comm, "node", "community")
      .as[(String, Long, Long, Long, Double, Double)].head()
    // qc = 7/7 - (14/14)^2 = 0
    assert(r == (("X", 6L, 7L, 14L, 0.0, 0.0)))
  }

  test("modularity: duplicate and self-loop edges are canonicalized") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L)).toDF("s", "d")
    val comm = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("node", "community")
    val r = Modularity.modularity(edges, "s", "d", comm, "node", "community")
      .orderBy("community")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    // canon edges: (1,2), (2,3); m=2; A: intra 1, degrees 1+2=3
    // qcA = 1/2 - (3/4)^2 = -0.0625; B: 0/2 - (1/4)^2 = -0.0625
    assert(r(0) == (("A", 2L, 1L, 3L, -0.0625, -0.125)))
    assert(r(1) == (("B", 1L, 0L, 1L, -0.0625, -0.125)))
  }

  test("assortativity: star graph is perfectly disassortative") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val r = Modularity.assortativity(star, "s", "d")
      .as[(Long, Double)].head()
    assert(r == ((3L, -1.0)))
  }

  test("assortativity: regular graph has null r (zero variance)") {
    // a 4-cycle: every node degree 2
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val r = Modularity.assortativity(cyc, "s", "d")
      .as[(Long, Option[Double])].head()
    assert(r == ((4L, None)))
  }
}
