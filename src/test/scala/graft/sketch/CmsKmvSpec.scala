package graft.sketch

import graft.SparkSuite

class CmsKmvSpec extends SparkSuite {
  import spark.implicits._

  test("CMS point estimates are upper bounds and exact when uncollided") {
    // 3 heavy tokens + 50 singletons in a 256-wide, 4-deep sketch:
    // collisions are possible but estimates can never undercount.
    val docs = (Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(10)("gamma") ++ (1 to 50).map(i => s"t$i"))
      .map(t => s"$t filler").toDF("text")
    val rep = Sketches.cmsTokenReport(docs, "text",
      depth = 4, width = 256, probeTopK = 5).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cms_n")
      assert(est >= exact, s"${r.getString(0)}: est $est < exact $exact")
    }
    // 'filler' appears in every row — the top probe — and with 53
    // distinct tokens in 4x256 cells at least one of its 4 rows is
    // overwhelmingly likely collision-free; sanity: estimate is within
    // the CMS error bound eps*N = (e/256)*250 ~ 3 even if not.
    val filler = rep.find(_.getString(0) == "filler").get
    assert(filler.getAs[Long]("cms_n") - filler.getAs[Long]("exact_n") <= 3)
  }

  test("KMV is exact below k and within 3/sqrt(k) above") {
    val k = 64
    // group small: 30 distinct values (< k, exact); group big: 5000
    val df = ((1 to 30).map(i => ("small", i)) ++
      (1 to 5000).map(i => ("big", i))).toDF("g", "v")
    val rep = Sketches.kmvDistinct(df, "g", "v", k = k)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("exact_distinct"), r.getAs[Double]("kmv_est"))).toMap
    assert(rep("small")._1 == 30L && rep("small")._2 == 30.0)
    val (exact, est) = rep("big")
    assert(exact == 5000L)
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 3.0 / math.sqrt(k), s"rel err $relErr too large")
  }

  test("KMV estimate is deterministic across repartitioning") {
    val df = (1 to 2000).map(i => ("g", s"v$i")).toDF("g", "v")
    val a = Sketches.kmvDistinct(df.repartition(7), "g", "v", k = 32)
      .collect().head.getAs[Double]("kmv_est")
    val b = Sketches.kmvDistinct(df.repartition(2), "g", "v", k = 32)
      .collect().head.getAs[Double]("kmv_est")
    assert(a == b)
  }
}
