package graft.de

import graft.SparkSuite

class KruskalWallisSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed three-group case without ties (scipy 7.2)") {
    val df = Seq(
      ("s", "a", 1.0), ("s", "a", 2.0), ("s", "a", 3.0),
      ("s", "b", 4.0), ("s", "b", 5.0), ("s", "b", 6.0),
      ("s", "c", 7.0), ("s", "c", 8.0), ("s", "c", 9.0))
      .toDF("scope", "cls", "v")
    val r = RankStats.kruskalWallis(df, "scope", "cls", "v").collect().head
    assert(r.getAs[Long]("n") == 9L)
    assert(r.getAs[Long]("dof") == 2L)
    assert(r.getAs[Double]("h") == 7.2)
    // no ties: correction factor 1, h_adj == h
    assert(r.getAs[Double]("h_adj") == 7.2)
  }

  test("tie correction: a=[1,1,2] b=[2,3,3] gives H=3.0476, Hadj=3.3333") {
    val df = Seq(
      ("s", "a", 1.0), ("s", "a", 1.0), ("s", "a", 2.0),
      ("s", "b", 2.0), ("s", "b", 3.0), ("s", "b", 3.0))
      .toDF("scope", "cls", "v")
    val r = RankStats.kruskalWallis(df, "scope", "cls", "v").collect().head
    assert(r.getAs[Double]("h") == 3.0476)
    assert(r.getAs[Double]("h_adj") == 3.3333)
  }

  test("single class in a scope yields H = 0; scopes are independent") {
    val df = (Seq(("one", "a", 1.0), ("one", "a", 5.0), ("one", "a", 9.0)) ++
      Seq(("two", "a", 1.0), ("two", "a", 2.0),
        ("two", "b", 8.0), ("two", "b", 9.0)))
      .toDF("scope", "cls", "v")
    val m = RankStats.kruskalWallis(df, "scope", "cls", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("h")).toMap
    assert(m("one") == 0.0)
    // two: ranks a={1,2} b={3,4}; H = 12/(4*5)*(9/2+49/2)-15 = 2.4
    assert(m("two") == 2.4)
  }

  test("all values tied: H = something finite, h_adj null (C = 0)") {
    val df = Seq(("s", "a", 5.0), ("s", "a", 5.0),
      ("s", "b", 5.0), ("s", "b", 5.0)).toDF("scope", "cls", "v")
    val r = RankStats.kruskalWallis(df, "scope", "cls", "v").collect().head
    assert(r.isNullAt(r.fieldIndex("h_adj")))
  }
}
