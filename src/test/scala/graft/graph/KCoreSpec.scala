package graft.graph

import graft.SparkSuite

class KCoreSpec extends SparkSuite {
  import spark.implicits._

  /** Reference peel: repeatedly drop vertices with degree < k. */
  private def brute(pairs: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val adj = pairs.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    var alive = adj.keySet
    var changed = true
    while (changed) {
      val next = alive.filter(v => adj(v).count(alive.contains) >= k)
      changed = next != alive
      alive = next
    }
    alive.map(v => v -> adj(v).count(alive.contains).toLong).toMap
  }

  test("2-core of a path is empty; of a cycle is the whole cycle") {
    val path = (0L until 5L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("src", "dst")
    assert(KCore.kCore(spark, path, 2).count() == 0L)
    val cycle = ((0L until 6L).sliding(2).map(s => (s(0), s(1))).toSeq
      :+ (5L, 0L)).toDF("src", "dst")
    val core = KCore.kCore(spark, cycle, 2).as[(Long, Long)].collect().toMap
    assert(core == (0L until 6L).map(_ -> 2L).toMap)
  }

  test("peel cascades: removing the pendant layer collapses the chain") {
    // K4 core {0,1,2,3} + chain 3-4-5-6: at k=2 the chain peels one
    // vertex per synchronous round from the far end inward, leaving K4.
    val edges = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))).toDF("src", "dst")
    val core = KCore.kCore(spark, edges, 2).as[(Long, Long)].collect().toMap
    assert(core == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(KCore.kCore(spark, edges, 3).as[(Long, Long)].collect().toMap
      == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(KCore.kCore(spark, edges, 4).count() == 0L)
  }

  test("matches brute force on a random graph, dups/self-loops ignored") {
    val rnd = new scala.util.Random(7)
    val pairs = (for {
      a <- 0L until 40L; b <- 0L to a     // includes self-loops
      if rnd.nextDouble() < 0.12
    } yield (a, b)).toSeq
    val edges = (pairs ++ pairs.take(5) ++ pairs.take(3).map(_.swap))
      .toDF("src", "dst")
    for (k <- 1 to 5) {
      val got = KCore.kCore(spark, edges, k).as[(Long, Long)].collect().toMap
      assert(got == brute(pairs, k), s"k=$k")
    }
  }

  test("driver and distributed paths agree") {
    val rnd = new scala.util.Random(11)
    val pairs = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
      if rnd.nextDouble() < 0.08
    } yield (a, b)).toSeq
    val edges = pairs.toDF("src", "dst")
    val driver = KCore.kCore(spark, edges, 3)
      .as[(Long, Long)].collect().toMap
    val dist = KCore.kCore(spark, edges, 3, edgeThreshold = 1L)
      .as[(Long, Long)].collect().toMap
    assert(driver == dist)
    assert(driver == brute(pairs, 3))
  }
}
