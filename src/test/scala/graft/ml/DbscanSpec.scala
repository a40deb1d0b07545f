package graft.ml

import graft.SparkSuite

class DbscanSpec extends SparkSuite {
  import spark.implicits._

  test("two blobs + noise: clusters found, labels are min member ids") {
    // blob A: ids 1-5 around (0,0); blob B: ids 11-15 around (100,100);
    // id 50 isolated
    val pts = (1 to 5).map(i => (i.toLong, i.toLong, 0L)) ++
      (11 to 15).map(i => (i.toLong, 100L + (i - 11), 100L)) ++
      Seq((50L, 500L, 500L))
    val out = Dbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y",
      eps = 5L, minPts = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    (1 to 5).foreach(i => assert(out(i.toLong) == ("core", 1L)))
    (11 to 15).foreach(i => assert(out(i.toLong) == ("core", 11L)))
    assert(out(50L) == ("noise", -1L))
  }

  test("border vs core vs noise roles; border takes min cluster") {
    // core triangle 1,2,3 tight; id 4 within eps of core 2 only (one
    // neighbor + itself < minPts, so border); id 9 out of range
    val pts = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L),
      (4L, 5L, 0L), (9L, 100L, 100L))
    val out = Dbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y",
      eps = 4L, minPts = 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "core" && out(2L) == "core" && out(3L) == "core")
    assert(out(4L) == "border")
    assert(out(9L) == "noise")
  }

  test("matches a brute-force reference on a hash scatter") {
    val pts = (1 to 120).map { i =>
      (i.toLong, (i * 2654435761L) % 60, (i * 40503L) % 60)
    }
    val eps = 6L; val minPts = 4
    // reference
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val dx = a._2 - b._2; val dy = a._3 - b._3; dx * dx + dy * dy
    }
    val nbrs = pts.map(p =>
      p._1 -> pts.filter(q => q._1 != p._1 && d2(p, q) <= eps * eps)
        .map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(i => nbrs(i).size + 1 >= minPts).toSet
    // union-find over core graph
    val parent = scala.collection.mutable.Map(core.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- core; j <- nbrs(i) if core(j)) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val label = core.map(i => i -> core.filter(j => find(j) == find(i)).min)
      .toMap
    val out = Dbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y",
      eps, minPts).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    pts.map(_._1).foreach { i =>
      if (core(i)) assert(out(i) == ("core", label(i)), s"core $i")
      else {
        val adjCore = nbrs(i).filter(core)
        if (adjCore.nonEmpty)
          assert(out(i) == ("border", adjCore.map(label).min), s"border $i")
        else assert(out(i) == ("noise", -1L), s"noise $i")
      }
    }
  }
}
