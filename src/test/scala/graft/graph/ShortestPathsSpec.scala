package graft.graph

import graft.SparkSuite

class ShortestPathsSpec extends SparkSuite {
  import spark.implicits._

  // a→b(1), b→c(1), a→c(5): c reached via b (2), not direct (5);
  // d unreachable; e→a(1) gives e no inbound, still distance null
  private val edges = Seq(
    ("a", "b", 1L), ("b", "c", 1L), ("a", "c", 5L), ("e", "a", 1L))
  private val nodes = Seq("a", "b", "c", "d", "e")

  test("relaxation beats the direct heavy arc; unreachable stays null") {
    Seq(
      ShortestPaths.fromSource(spark, nodes.toDF("gene"),
        edges.toDF("src", "dst", "w"), "a"),
      ShortestPaths.fromSourceDistributed(spark, nodes.toDF("gene"),
        edges.toDF("src", "dst", "w"), "a")
    ).foreach { df =>
      val got = df.as[(String, Option[Long])].collect().toMap
      assert(got == Map("a" -> Some(0L), "b" -> Some(1L), "c" -> Some(2L),
        "d" -> None, "e" -> None))
    }
  }

  test("matches brute-force Floyd-Warshall on a random integer graph") {
    val rnd = new scala.util.Random(13)
    val n = 12
    val names = (0 until n).map(i => s"v$i")
    val arcs = (for {
      a <- 0 until n; b <- 0 until n
      if a != b && rnd.nextDouble() < 0.2
    } yield (names(a), names(b), (rnd.nextInt(9) + 1).toLong)).toSeq
    val inf = Long.MaxValue / 4
    val d = Array.fill(n, n)(inf)
    (0 until n).foreach(i => d(i)(i) = 0L)
    arcs.foreach { case (u, v, w) =>
      val (i, j) = (names.indexOf(u), names.indexOf(v))
      d(i)(j) = math.min(d(i)(j), w)
    }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
    val got = ShortestPaths.fromSource(spark, names.toDF("gene"),
        arcs.toDF("src", "dst", "w"), "v0")
      .as[(String, Option[Long])].collect().toMap
    names.zipWithIndex.foreach { case (g, i) =>
      val exp = if (d(0)(i) >= inf) None else Some(d(0)(i))
      assert(got(g) == exp, s"node $g")
    }
  }

  test("allPairs matches Floyd-Warshall from EVERY source, and the " +
    "driver/distributed paths agree") {
    val rnd = new scala.util.Random(29)
    val n = 8
    val names = (0 until n).map(i => s"v$i")
    val arcs = (for {
      a <- 0 until n; b <- 0 until n
      if a != b && rnd.nextDouble() < 0.25
    } yield (names(a), names(b), (rnd.nextInt(9) + 1).toLong)).toSeq
    val inf = Long.MaxValue / 4
    val d = Array.fill(n, n)(inf)
    (0 until n).foreach(i => d(i)(i) = 0L)
    arcs.foreach { case (u, v, w) =>
      val (i, j) = (names.indexOf(u), names.indexOf(v))
      d(i)(j) = math.min(d(i)(j), w)
    }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
    val nodes = names.toDF("gene")
    val edges = arcs.toDF("src", "dst", "w")
    val driver = ShortestPaths.allPairs(spark, nodes, edges)
      .as[(String, String, Option[Long])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val dist = ShortestPaths.allPairsDistributed(spark, nodes, edges)
      .as[(String, String, Option[Long])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(driver == dist)
    for (i <- 0 until n; j <- 0 until n) {
      val exp = if (d(i)(j) >= inf) None else Some(d(i)(j))
      assert(driver((names(i), names(j))) == exp, s"pair $i->$j")
    }
  }

  test("closenessStats on a directed path a->b->c (unit weights)") {
    val nodes = Seq("a", "b", "c").toDF("gene")
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val m = ShortestPaths.closenessStats(spark, nodes, edges)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("a").getAs[Long]("n_reachable") == 2L)
    assert(m("a").getAs[Long]("eccentricity") == 2L)
    // closeness = 2/(1+2); harmonic = 1 + 1/2
    assert(m("a").getAs[Double]("closeness") ==
      math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(m("a").getAs[Double]("harmonic") == 1.5)
    // sink c reaches nothing: null closeness/eccentricity, harmonic 0
    assert(m("c").getAs[Long]("n_reachable") == 0L)
    assert(m("c").isNullAt(m("c").fieldIndex("eccentricity")))
    assert(m("c").isNullAt(m("c").fieldIndex("closeness")))
    assert(m("c").getAs[Double]("harmonic") == 0.0)
  }
}
