package graft.events

import graft.SparkSuite

class SpectralEntropySpec extends SparkSuite {
  import spark.implicits._

  test("spectralEntropy: a pure sinusoid concentrates the spectrum " +
    "(near 0); alternating-sign noise-free ramp stays high") {
    val n = 32
    val sine = (0 until n).map(t =>
      ("sine", t, math.sin(2 * math.Pi * 4 * t / n)))
    val r = Spectral.spectralEntropy(sine.toDF("g", "b", "v"),
      "g", "b", "v").head()
    assert(r.getAs[Long]("n_freq") == 16L)
    assert(r.getAs[Double]("norm_entropy") < 0.05)
  }

  test("spectralEntropy: constant series yields null entropy; " +
    "single-point keys drop out") {
    val df = (Seq(("c", 1, 5.0), ("c", 2, 5.0), ("c", 3, 5.0),
      ("c", 4, 5.0)) ++ Seq(("one", 1, 3.0))).toDF("g", "b", "v")
    val rows = Spectral.spectralEntropy(df, "g", "b", "v").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "c")
    assert(rows.head.isNullAt(rows.head.fieldIndex("entropy")))
  }

  test("mannKendallTest: monotone series maxes S with a tiny " +
    "p-value; flat series p = 1") {
    val up = (1 to 20).map(i => ("up", i, i * 2.0))
    val flat = (1 to 20).map(i => ("flat", i, 7.0))
    val r = graft.ml.TrendStats.mannKendallTest(
      (up ++ flat).toDF("g", "t", "v"), "g", "t", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("up").getAs[Long]("s") == 190L)   // all 190 pairs rise
    assert(r("up").getAs[Double]("p_value") < 1e-5)
    assert(r("flat").getAs[Long]("s") == 0L)
    assert(r("flat").getAs[Double]("z") == 0.0)
    assert(r("flat").getAs[Double]("p_value") == 1.0)
  }

  test("mannKendallTest: tie correction shrinks Var(S)") {
    val noTies = (1 to 10).map(i => ("a", i, i.toDouble))
    val ties = (1 to 10).map(i => ("b", i, (i / 2).toDouble))
    val r = graft.ml.TrendStats.mannKendallTest(
      (noTies ++ ties).toDF("g", "t", "v"), "g", "t", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    // n=10 untied: Var = 10*9*25/18 = 125
    assert(r("a").getAs[Double]("var_s") == 125.0)
    assert(r("b").getAs[Double]("var_s") < 125.0)
  }
}
