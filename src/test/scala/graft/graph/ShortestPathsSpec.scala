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
}
