package graft.graph

import graft.SparkSuite

class SccSpec extends SparkSuite {
  import spark.implicits._

  private def graph = {
    // cycle 1->2->3->1, feeder 4->1, isolated 5, 2-cycle 6<->7
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L),
      (6L, 7L), (7L, 6L)).toDF("src", "dst")
    (nodes, edges)
  }

  private val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
    4L -> 4L, 5L -> 5L, 6L -> 6L, 7L -> 6L)

  test("tarjan driver path labels SCCs with their min node id") {
    val (nodes, edges) = graph
    val got = Scc.components(spark, nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("distributed coloring path agrees with the driver path") {
    val (nodes, edges) = graph
    val got = Scc.components(spark, nodes, edges,
        driverNodeThreshold = 0L, driverEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("a long directed path is n singleton SCCs (stack-safe driver)") {
    val n = 2000
    val nodes = (1 to n).map(_.toLong).toDF("node")
    val edges = (1 until n).map(i => (i.toLong, i.toLong + 1))
      .toDF("src", "dst")
    val got = Scc.components(spark, nodes, edges)
      .as[(Long, Long)].collect()
    assert(got.length == n && got.forall { case (v, c) => v == c })
  }
}
