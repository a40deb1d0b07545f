package graft.de

import graft.SparkSuite

class JtBmSpec extends SparkSuite {
  import spark.implicits._

  test("jonckheereTerpstra: perfectly ordered groups, hand-solved " +
    "z and tail") {
    // g1 {1,2} < g2 {3,4} < g3 {5,6}: JT = 12, mean 6, var 456/72
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g2", 3.0), ("g2", 4.0),
      ("g3", 5.0), ("g3", 6.0)).toDF("g", "v")
    val r = RankStats.jonckheereTerpstra(df, "g", "v",
      Seq("g1", "g2", "g3")).head()
    assert(r.getAs[Long]("n") == 6L && r.getAs[Int]("k") == 3)
    assert(r.getAs[Double]("jt") == 12.0)
    assert(r.getAs[Double]("mean") == 6.0)
    assert(r.getAs[Double]("z") == 2.3842)
    assert(r.getAs[Double]("p_value") == 0.017118)
  }

  test("jonckheereTerpstra: ties carry half credit; reversed order " +
    "flips the sign") {
    val tied = Seq(("g1", 1.0), ("g1", 2.0), ("g2", 2.0), ("g2", 3.0))
      .toDF("g", "v")
    // U12 = (a<b pairs: (1,2),(1,3),(2,3)) + ½·(2,2) = 3.5
    val r = RankStats.jonckheereTerpstra(tied, "g", "v",
      Seq("g1", "g2")).head()
    assert(r.getAs[Double]("jt") == 3.5)
    val rev = RankStats.jonckheereTerpstra(tied, "g", "v",
      Seq("g2", "g1")).head()
    assert(rev.getAs[Double]("jt") == 0.5)   // only the tie half
    assert(rev.getAs[Double]("z") < 0)
  }

  test("jonckheereTerpstra: single-group input nulls out") {
    val df = Seq(("g1", 1.0), ("g1", 2.0)).toDF("g", "v")
    val r = RankStats.jonckheereTerpstra(df, "g", "v",
      Seq("g1", "g2")).head()
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("brunnerMunzel: scipy docstring example parity") {
    // x1/x2 from the scipy.stats.brunnermunzel docstring:
    // W = 3.1374674823, p = 0.0057862087
    val x1 = Seq(1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1)
    val x2 = Seq(3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4)
    val df = (x1.map(v => ("a", v.toDouble)) ++
      x2.map(v => ("b", v.toDouble))).toDF("g", "v")
    val r = RankStats.brunnerMunzel(df, "g", "v", "a", "b").head()
    assert(r.getAs[Long]("n_a") == 14L && r.getAs[Long]("n_b") == 11L)
    assert(r.getAs[Double]("t_stat") == 3.1375)
    assert(r.getAs[Double]("df") == 17.68)
    assert(r.getAs[Double]("p_hat") == 0.789)
    assert(math.abs(r.getAs[Double]("p_value") - 0.0057862) < 1e-5)
  }

  test("brunnerMunzel: identical samples give p_hat ½ and a null " +
    "degenerate statistic; tiny sides null out") {
    val same = (Seq.fill(3)(("a", 1.0)) ++ Seq.fill(3)(("b", 1.0)))
      .toDF("g", "v")
    val r = RankStats.brunnerMunzel(same, "g", "v", "a", "b").head()
    assert(r.getAs[Double]("p_hat") == 0.5)
    assert(r.isNullAt(r.fieldIndex("t_stat")))
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val t = RankStats.brunnerMunzel(tiny, "g", "v", "a", "b").head()
    assert(t.isNullAt(t.fieldIndex("p_value")))
  }
}
