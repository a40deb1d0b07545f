package graft.graph

import graft.SparkSuite

class LinkPredictionSpec extends SparkSuite {
  import spark.implicits._

  test("path graph: end-pair predicted via the middle vertex") {
    // 1-2-3: pair (1,3) shares neighbor 2; jaccard 1/1 = 1? deg(1)=1,
    // deg(3)=1, common=1 -> 1/(1+1-1)=1, not an edge
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = LinkPrediction.neighborhoodJaccard(e).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L)
    assert(r.getAs[Long]("common") == 1L)
    assert(r.getAs[Double]("jaccard") == 1.0)
    assert(!r.getAs[Boolean]("is_edge"))
  }

  test("triangle: each pair is an edge with jaccard 1/3") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val out = LinkPrediction.neighborhoodJaccard(e).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("common") == 1L)
      assert(r.getAs[Boolean]("is_edge"))
      assert(r.getAs[Double]("jaccard") == BigDecimal(1.0 / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("brute force parity on a hash graph, with minCommon filter") {
    val edges = (1 to 150).map(i =>
      ((i * 2654435761L) % 23, (i * 40503L) % 23)).filter(e => e._1 != e._2)
    val canon = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct
    val adj = canon.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      a <- adj.keys; b <- adj.keys if a < b
      c = (adj(a) & adj(b)).size if c >= 2
    } yield (a, b) -> c).toMap
    val out = LinkPrediction.neighborhoodJaccard(
      edges.toDF("src", "dst"), minCommon = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("common"))
      .toMap
    assert(out == want.map { case (k, v) => k -> v.toLong })
  }

  test("maxDegree drops hub-mediated wedges but keeps exact degrees") {
    // star: hub 0 connected to 1..6; plus 1-2 edge
    val e = ((1 to 6).map(i => (0L, i.toLong)) ++ Seq((1L, 2L)))
      .toDF("src", "dst")
    val full = LinkPrediction.neighborhoodJaccard(e)
    // 15 leaf pairs via the hub + (0,1) via middle 2 + (0,2) via middle 1
    assert(full.count() == 17L)
    val capped = LinkPrediction.neighborhoodJaccard(e, maxDegree = 5L)
    val rows = capped.collect()
    // hub (deg 6) excluded as middle: only wedge left is via 1 or 2
    assert(rows.forall(r => r.getLong(0) != 0L || r.getLong(1) != 0L))
    // pair (0, anything) via middles 1 or 2 only
    val pair02 = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 2L)
    assert(pair02.get.getAs[Long]("deg_a") == 6L) // degree stays exact
  }
}
