package graft.ml

import graft.SparkSuite

class ForecastRankSpec extends SparkSuite {
  import spark.implicits._

  test("quantileForecastEval: stationary series calibrates; the " +
    "median forecast is the first-half median") {
    // first half 1..50, second half identical distribution
    val rows = (1 to 50).map(i => ("g", i, i.toDouble)) ++
      (51 to 100).map(i => ("g", i, (i - 50).toDouble))
    val r = Ranking.quantileForecastEval(rows.toDF("g", "b", "v"),
      "g", "b", "v", Seq(0.1, 0.5, 0.9)).collect()
      .map(x => x.getAs[Double]("q") -> x).toMap
    assert(r(0.5).getAs[Double]("forecast") == 25.5)
    // coverage near the nominal level on the identical test half
    assert(math.abs(r(0.1).getAs[Double]("coverage") - 0.1) < 0.05)
    assert(math.abs(r(0.9).getAs[Double]("coverage") - 0.9) < 0.05)
    // pinball at the tails is cheaper than at the median for a
    // symmetric distribution
    assert(r(0.5).getAs[Double]("pinball") >
      r(0.1).getAs[Double]("pinball"))
  }

  test("rbo: identical rankings score 1 at any depth; disjoint " +
    "top-depth prefixes score 0") {
    val same = (1 to 30).map(i => ("s", i, i))
    val swapped = (1 to 30).map(i => ("d", i, 31 - i))
    val df = (same ++ swapped).toDF("k", "ra", "rb")
    val r = Ranking.rbo(df, "k", "ra", "rb", depth = 10, p = 0.9)
      .collect().map(x => x.getString(0) -> x).toMap
    // truncated RBO of identical lists = (1-p)·Σ p^{d-1} = 1 - p^D
    val expected = 1.0 - math.pow(0.9, 10)
    assert(r("s").getAs[Double]("rbo") ==
      math.round(expected * 1e4) / 1e4)
    // reversed 30-list: top-10 of A = 1..10, top-10 of B = 21..30,
    // no overlap at any depth <= 10
    assert(r("d").getAs[Double]("rbo") == 0.0)
  }

  test("kendallsW: unanimous raters give W = 1; reversal kills it") {
    val unanimous = for (r <- 1 to 3; i <- 1 to 4)
      yield (r, s"item$i", i.toDouble)
    val w1 = graft.de.RankStats.kendallsW(
      unanimous.toDF("r", "i", "v"), "r", "i", "v").head()
    assert(w1.getAs[Int]("m") == 3)
    assert(w1.getAs[Double]("w") == 1.0)
    // two raters in perfect disagreement -> W = 0
    val opposed = (1 to 4).map(i => (1, s"item$i", i.toDouble)) ++
      (1 to 4).map(i => (2, s"item$i", (5 - i).toDouble))
    val w0 = graft.de.RankStats.kendallsW(
      opposed.toDF("r", "i", "v"), "r", "i", "v").head()
    assert(w0.getAs[Double]("w") == 0.0)
  }

  test("nnMatchedAtt: matches recover the planted constant effect") {
    // controls at x = 1..20 with y = x; treated at x + 0.1 with
    // y = x + 5 -> every treated matches its own control, ATT = 5.1
    val controls = (1 to 20).map(i => ("s", 0, i.toDouble, i.toDouble))
    val treated = (1 to 20).map(i =>
      ("s", 1, i + 0.1, i + 5.1))
    val r = graft.de.Experiment.nnMatchedAtt(
      (controls ++ treated).toDF("s", "t", "x", "y"),
      "s", "t", "x", "y").head()
    assert(r.getAs[Long]("n_treated") == 20L)
    assert(r.getAs[Double]("att") == 5.1)
    assert(math.abs(r.getAs[Double]("avg_match_dist") - 0.1) < 1e-9)
  }

  test("termBurstiness: a clumped term outranks an evenly spread " +
    "one at equal total count") {
    // 'burst' appears 5x in each of 2 docs; 'even' once in each of
    // 10 docs -> same total, very different VMR
    val docs = (1 to 2).map(i =>
      (i.toLong, "burst burst burst burst burst pad")) ++
      (3 to 12).map(i => (i.toLong, "even pad"))
    val r = graft.text.CorpusStats.termBurstiness(
      docs.toDF("id", "text"), "id", "text", minDf = 2L, topK = 5)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("burst").getAs[Double]("vmr") >
      r("even").getAs[Double]("vmr") * 3)
    assert(r.contains("pad"))
  }
}
