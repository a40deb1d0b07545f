package graft.de

import graft.SparkSuite

class FriedmanAssocSpec extends SparkSuite {
  import spark.implicits._

  test("friedman: textbook complete-block table") {
    // 4 blocks x 3 treatments, c always best, a always worst:
    // ranks a=1,b=2,c=3 in every block -> R = (4, 8, 12)
    // Q = 12/(4*3*4)*(16+64+144) - 3*4*4 = 56 - 48 = 8
    val rows = for (b <- 1 to 4) yield
      Seq((b, "a", 1.0 + b), (b, "b", 2.0 + b), (b, "c", 3.0 + b))
    val r = RankStats.friedman(rows.flatten.toDF("b", "t", "v"),
      "b", "t", "v").head()
    assert(r.getAs[Int]("k") == 3)
    assert(r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Double]("q") == 8.0)
    assert(r.getAs[Double]("p_value") ==
      math.round(math.exp(-4.0) * 1e6) / 1e6)
  }

  test("friedman: incomplete blocks are dropped; within-block ties " +
    "take average ranks") {
    // block 9 misses treatment c -> dropped entirely
    // block 1: a=b tie -> both rank 1.5, c rank 3; block 2 ordered
    val rows = Seq((1, "a", 5.0), (1, "b", 5.0), (1, "c", 9.0),
      (2, "a", 1.0), (2, "b", 2.0), (2, "c", 3.0),
      (9, "a", 1.0), (9, "b", 2.0))
    val r = RankStats.friedman(rows.toDF("b", "t", "v"),
      "b", "t", "v").head()
    assert(r.getAs[Long]("n_blocks") == 2L)
    // R_a = 1.5+1 = 2.5, R_b = 1.5+2 = 3.5, R_c = 3+3 = 6
    // Q = 12/(2*3*4)*(6.25+12.25+36) - 3*2*4 = 27.25 - 24 = 3.25
    assert(r.getAs[Double]("q") == 3.25)
  }

  test("predictiveAssociation: perfect prediction gives lambda 1 and " +
    "uncertainty 1; independence gives 0") {
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"),
      ("c", "z")).toDF("f", "g")
    val p = InfoTheory.predictiveAssociation(perfect, "f", "g").head()
    assert(p.getAs[Double]("lambda") == 1.0)
    assert(p.getAs[Double]("uncertainty") == 1.0)
    val indep = (for (x <- Seq("a", "b"); y <- Seq("x", "y"))
      yield (x, y)).toDF("f", "g")
    val i = InfoTheory.predictiveAssociation(indep, "f", "g").head()
    assert(i.getAs[Double]("lambda") == 0.0)
    assert(i.getAs[Double]("uncertainty") == 0.0)
  }

  test("predictiveAssociation: off-mode association — lambda 0 but " +
    "uncertainty > 0 (why both are reported)") {
    // y mode is 'm' within every x, but the minor class flips with x
    val rows = Seq.fill(3)(("a", "m")) ++ Seq(("a", "p")) ++
      Seq.fill(3)(("b", "m")) ++ Seq(("b", "q"))
    val r = InfoTheory.predictiveAssociation(rows.toDF("f", "g"),
      "f", "g").head()
    assert(r.getAs[Double]("lambda") == 0.0)
    assert(r.getAs[Double]("uncertainty") > 0.0)
  }
}
