package graft.de

import graft.SparkSuite

class GumbelSpec extends SparkSuite {
  import spark.implicits._

  /** Driver-side L-moment reference on a pre-blocked maxima series. */
  private def ref(ms: Seq[Double]): (Double, Double, Double) = {
    val s = ms.sorted
    val n = s.size.toDouble
    val b0 = s.sum / n
    val b1 = s.zipWithIndex.map { case (x, i) => i * x }.sum /
      (n * (n - 1))
    val b2 = s.zipWithIndex.map { case (x, i) =>
      i.toDouble * (i - 1) * x }.sum / (n * (n - 1) * (n - 2))
    val l1 = b0; val l2 = 2 * b1 - b0
    val t3 = (6 * b2 - 6 * b1 + b0) / l2
    val beta = l2 / math.log(2.0)
    val mu = l1 - 0.5772156649015329 * beta
    (mu, beta, t3)
  }

  test("hand-blocked maxima: location/scale/skew match the driver " +
    "L-moment reference") {
    // 3 blocks per value set: max per (g, block) is the fit input
    val rows = Seq(
      ("g", 1, 3.0), ("g", 1, 9.0), ("g", 2, 4.0), ("g", 2, 12.0),
      ("g", 3, 5.0), ("g", 4, 21.0), ("g", 4, 2.0), ("g", 5, 7.0),
      ("g", 6, 15.0)).toDF("g", "b", "v")
    val got = Evt.gumbelBlockMaxima(rows, "g", "b", "v").head()
    val (mu, beta, t3) = ref(Seq(9.0, 12.0, 5.0, 21.0, 7.0, 15.0))
    assert(got.getAs[Long]("n_blocks") == 6)
    assert(approx(got.getAs[Double]("location"), mu, 1e-3))
    assert(approx(got.getAs[Double]("scale"), beta, 1e-3))
    assert(approx(got.getAs[Double]("l_skew"), t3, 1e-3))
    // return level ordering: rl_100 > rl_20 > location
    assert(got.getAs[Double]("rl_100") > got.getAs[Double]("rl_20"))
    assert(got.getAs[Double]("rl_20") > got.getAs[Double]("location"))
  }

  test("a Gumbel quantile grid recovers its own parameters and " +
    "shows ~zero l_skew_gap; a heavy-tail transform shows positive") {
    val (muT, betaT) = (50.0, 8.0)
    def gq(u: Double): Double = muT - betaT * math.log(-math.log(u))
    val gumbel = (1 to 400).map(i =>
      ("gum", i, gq((i - 0.5) / 400.0)))
    // Frechet-ish: exponentiate a scaled Gumbel grid -> heavy tail
    val heavy = (1 to 400).map(i =>
      ("hvy", i, math.exp(gq((i - 0.5) / 400.0) / 25.0)))
    val r = Evt.gumbelBlockMaxima((gumbel ++ heavy).toDF("g", "b", "v"),
        "g", "b", "v")
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    assert(math.abs(r("gum").getAs[Double]("location") - muT) < 0.5)
    assert(math.abs(r("gum").getAs[Double]("scale") - betaT) < 0.3)
    assert(math.abs(r("gum").getAs[Double]("l_skew_gap")) < 0.02)
    assert(r("hvy").getAs[Double]("l_skew_gap") > 0.05)
    // the 1-in-100 return level sits near the 99th pct of the grid
    assert(math.abs(r("gum").getAs[Double]("rl_100") - gq(0.99)) < 1.0)
  }

  test("tied maxima are rank-assignment invariant (exact 4dp equality " +
    "across a reshuffle)") {
    val base = Seq(7.0, 7.0, 7.0, 3.0, 11.0, 7.0, 5.0)
    val a = base.zipWithIndex.map { case (v, i) => ("g", i, v) }
    val b = base.reverse.zipWithIndex.map { case (v, i) => ("g", i, v) }
    val ra = Evt.gumbelBlockMaxima(a.toDF("g", "b", "v"), "g", "b", "v")
      .head()
    val rb = Evt.gumbelBlockMaxima(b.toDF("g", "b", "v"), "g", "b", "v")
      .head()
    assert(ra.getAs[Double]("location") == rb.getAs[Double]("location"))
    assert(ra.getAs[Double]("scale") == rb.getAs[Double]("scale"))
  }

  test("fewer than 3 blocks yields a null fit, not an error; nulls " +
    "are dropped before blocking") {
    val df = Seq(("g", 1, Some(5.0)), ("g", 2, Some(9.0)),
      ("g", 2, None)).toDF("g", "b", "v")
    val got = Evt.gumbelBlockMaxima(df, "g", "b", "v").head()
    assert(got.getAs[Long]("n_blocks") == 2)
    assert(got.isNullAt(got.fieldIndex("location")))
    assert(got.isNullAt(got.fieldIndex("rl_100")))
  }
}
