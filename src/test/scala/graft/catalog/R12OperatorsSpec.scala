package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Unit pins for the round-12 operator batch (X316–X323): each test is
  * a small hand-computable fixture — the catalog oracle covers the
  * cross-engine compare; these pin the DEFINITIONS.
  */
class R12OperatorsSpec extends SparkSuite {
  import spark.implicits._

  test("tCloseness: hand-computed ordered EMD against the release " +
    "distribution; null sensitive rows are dropped") {
    // release: 6 zeros / 2 ones -> F_all(0) = 0.75, m = 2
    val df = Seq(
      ("A", 0L), ("A", 1L), ("A", 0L), ("A", 1L),
      ("B", 0L), ("B", 0L), ("B", 0L), ("B", 0L))
      .toDF("qi", "v")
    val out = graft.privacy.Privacy.tCloseness(df, Seq("qi"), "v", 0.3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // A: F(0) = 0.5 -> emd = |0.5 - 0.75| / (m-1) = 0.25
    assert(out("A")._2 === 0.25)
    assert(out("A")._3)
    // B: F(0) = 1.0 -> emd = |1.0 - 0.75| = 0.25
    assert(out("B")._2 === 0.25)
    // null sensitive rows are dropped (ranked-axis contract)
    val withNull = df.union(Seq(("A", null.asInstanceOf[java.lang.Long]))
      .toDF("qi", "v"))
    val out2 = graft.privacy.Privacy.tCloseness(withNull, Seq("qi"),
      "v", 0.3).collect()
    assert(out2.map(_.getLong(1)).sum === 8L) // class sizes unchanged
  }

  test("rmstByGroup: no censoring, tau past the last event -> RMST " +
    "equals the exact step integral; tau truncation caps it") {
    // one group: deaths at t = 1, 2, 3 (n = 3)
    // S = 2/3 on [1,2), 1/3 on [2,3), 0 after
    // RMST(10) = 1*1 + (2/3)*1 + (1/3)*1 = 2.0
    val df = Seq(("g", 1L, 1), ("g", 2L, 1), ("g", 3L, 1))
      .toDF("grp", "dur", "ev")
    val r = graft.de.Survival.rmstByGroup(df, "grp", "dur", "ev", 10.0)
      .collect().head
    assert(r.getAs[Long]("n_subjects") === 3L)
    assert(approx(r.getAs[Double]("rmst"), 2.0, 1e-6))
    // tau = 1.5: integral = 1*1 + (2/3)*0.5 = 1.3333
    val r2 = graft.de.Survival.rmstByGroup(df, "grp", "dur", "ev", 1.5)
      .collect().head
    assert(approx(r2.getAs[Double]("rmst"), 1.0 + 2.0 / 3 * 0.5, 1e-4))
  }

  test("bartlett: equal-variance groups give chi2 near 0; k != 5 " +
    "yields a null p (dof-bound closed form)") {
    val rng = new scala.util.Random(7)
    val rows = for (g <- 0 until 5; _ <- 0 until 50)
      yield (s"g$g", rng.nextGaussian())
    val r = graft.de.Inference.bartlett(rows.toDF("g", "v"), "g", "v")
      .collect().head
    assert(r.getAs[Long]("k") === 5L)
    assert(r.getAs[Double]("chi2") < 12.0) // ~chi2_4 under H0
    assert(!r.isNullAt(r.fieldIndex("p_value")))
    val r4 = graft.de.Inference.bartlett(
      rows.filter(_._1 != "g4").toDF("g", "v"), "g", "v")
      .collect().head
    assert(r4.isNullAt(r4.fieldIndex("p_value")))
    // zero-variance group is excluded and counted
    val withConst = rows ++ Seq.fill(10)(("gc", 1.0))
    val rc = graft.de.Inference.bartlett(withConst.toDF("g", "v"),
      "g", "v").collect().head
    assert(rc.getAs[Long]("k") === 5L)
    assert(rc.getAs[Long]("k_dropped") === 1L)
  }

  test("mapAtK: hand-computed AP and recall") {
    // one query, 4 docs ranked by score desc: rel pattern 1,0,1,0
    // AP@10 = (1/1 + 2/3) / min(2,10) = 0.833333
    val df = Seq(("q", 1L, 3.0, 0.9), ("q", 2L, 0.0, 0.8),
      ("q", 3L, 3.0, 0.7), ("q", 4L, 0.0, 0.6))
      .toDF("query", "id", "rel", "score")
    val r = graft.ml.Ranking.mapAtK(df, "query", "id", "rel", "score",
      k = 10, relThreshold = 2.0).collect().head
    assert(approx(r.getAs[Double]("ap_at_k"), (1.0 + 2.0 / 3) / 2, 1e-5))
    assert(r.getAs[Double]("recall_at_k") === 1.0)
    // no relevant in top-k but some exist -> ap 0, not null
    val df2 = (1 to 12).map(i =>
      ("q", i.toLong, if (i == 12) 3.0 else 0.0, 1.0 - i * 0.01))
      .toDF("query", "id", "rel", "score")
    val r2 = graft.ml.Ranking.mapAtK(df2, "query", "id", "rel",
      "score", k = 10, relThreshold = 2.0).collect().head
    assert(r2.getAs[Double]("ap_at_k") === 0.0)
  }

  test("ordinalAssociation: perfect monotone grid -> gamma/somers/" +
    "tau_b = 1; brute-force pair parity on a random banded fixture") {
    val mono = Seq((1, 1), (2, 2), (3, 3), (1, 1), (2, 2))
      .toDF("x", "y")
    val rm = graft.de.RankStats.ordinalAssociation(mono, "x", "y")
      .collect().head
    assert(rm.getAs[Double]("gamma") === 1.0)
    assert(rm.getAs[Double]("somers_d_yx") === 1.0)
    assert(rm.getAs[Double]("tau_b") === 1.0)
    // randomized brute-force parity
    val rng = new scala.util.Random(11)
    val pts = Seq.fill(60)((rng.nextInt(4), rng.nextInt(3)))
    val r = graft.de.RankStats.ordinalAssociation(
      pts.toDF("x", "y"), "x", "y").collect().head
    var (cc, dd, tx, ty, txy) = (0L, 0L, 0L, 0L, 0L)
    for (i <- pts.indices; j <- i + 1 until pts.size) {
      val (x1, y1) = pts(i); val (x2, y2) = pts(j)
      if (x1 == x2 && y1 == y2) txy += 1
      else if (x1 == x2) tx += 1
      else if (y1 == y2) ty += 1
      else if ((x1 < x2) == (y1 < y2)) cc += 1
      else dd += 1
    }
    assert(r.getAs[Long]("n_concordant") === cc)
    assert(r.getAs[Long]("n_discordant") === dd)
    assert(r.getAs[Long]("t_x") === tx)
    assert(r.getAs[Long]("t_y") === ty)
    assert(r.getAs[Long]("t_xy") === txy)
  }

  test("winnowingFingerprints: the winnowing guarantee — docs sharing " +
    "a >= w+k-1 token run share a fingerprint; short docs emit none") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, s"one two $shared three"),
      (2L, s"$shared nine ten eleven"),
      (3L, "tiny doc only")).toDF("doc_id", "text")
    val fp = graft.dedup.Dedup.winnowingFingerprints(df, "doc_id",
      "text", k = 5, w = 4)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    assert(!byDoc.contains(3L)) // < k+w-1 tokens: no complete window
    // selection density: fingerprints <= complete windows
    val g1 = 13 - 4 // 13 tokens in doc 1 -> 9 grams -> 6 windows
    assert(byDoc(1L).size <= g1 - 3)
  }

  test("qiniCurve: hand case — treated converters ranked first give " +
    "positive qini at the top bucket") {
    // bucket 9: 2 treated (2 conv), 2 control (0 conv)
    // bucket 1: 2 treated (0 conv), 2 control (1 conv)
    val df = Seq(
      (1, 1, 9.0), (1, 1, 9.0), (0, 0, 9.0), (0, 0, 9.0),
      (1, 0, 1.0), (1, 0, 1.0), (0, 1, 1.0), (0, 0, 1.0))
      .toDF("tr", "y", "score")
    val rows = graft.ml.Uplift.qiniCurve(df, "tr", "y", "score",
      bucketDp = 0).orderBy(col("bucket").desc).collect()
    assert(rows.head.getAs[Double]("qini") === 2.0) // 2 - 0*(2/2)
    // full depth: 2 - 1 * (4/4) = 1.0
    assert(rows.last.getAs[Double]("qini") === 1.0)
    // null score/outcome rows are dropped (ranked-axis contract)
    val withNull = df.union(Seq((1, 1, null.asInstanceOf[java.lang.Double]))
      .toDF("tr", "y", "score"))
    val n2 = graft.ml.Uplift.qiniCurve(withNull, "tr", "y", "score",
      bucketDp = 0).agg(sum(col("n_treated") + col("n_control")))
      .collect().head.getLong(0)
    assert(n2 === 8L)
  }

  test("cramerVonMises: identical samples -> T near its floor; " +
    "disjoint samples -> large T; brute parity on a tied fixture") {
    val same = (1 to 40).map(i => ("g", if (i % 2 == 0) "A" else "B",
      (i % 5).toDouble)).toDF("g", "s", "v")
    val r = graft.de.RankStats.cramerVonMises(same, "g", "s", "v",
      "A", "B").collect().head
    assert(r.getAs[Double]("t") < r.getAs[Double]("t_expected"))
    // brute-force replay of the definition on a small tied sample
    val va = Seq(1.0, 2.0, 2.0, 5.0)
    val vb = Seq(2.0, 3.0, 3.0, 9.0, 9.0)
    val df = (va.map(("g", "A", _)) ++ vb.map(("g", "B", _)))
      .toDF("g", "s", "v")
    val rr = graft.de.RankStats.cramerVonMises(df, "g", "s", "v",
      "A", "B").collect().head
    val n = va.size.toDouble; val m = vb.size.toDouble
    val pooled = (va ++ vb).sorted
    val t = pooled.map { x =>
      val fa = va.count(_ <= x) / n
      val fb = vb.count(_ <= x) / m
      (fa - fb) * (fa - fb)
    }.sum * n * m / math.pow(n + m, 2)
    assert(approx(rr.getAs[Double]("t"), t, 1e-6))
  }
}
