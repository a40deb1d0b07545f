package graft.reco

import graft.SparkSuite

class ItemSimSpec extends SparkSuite {
  import spark.implicits._

  test("cosine matches hand computation; both orientations present") {
    // baskets: {A,B} x3, {A,C} x1, {B,C} x1 -> sup A=4, B=4, C=2
    val rows = Seq((1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"),
      (3, "B"), (4, "A"), (4, "C"), (5, "B"), (5, "C"))
    val out = ItemSim.topNeighbors(rows.toDF("bk", "it"), "bk", "it",
      minSupport = 1L, minPairCount = 1L, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("cosine"))).toMap
    def r6(v: Double) = BigDecimal(v).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("A", "B")) == (3L, r6(3 / math.sqrt(16.0))))
    assert(out(("B", "A")) == (3L, r6(3 / math.sqrt(16.0))))
    assert(out(("A", "C")) == (1L, r6(1 / math.sqrt(8.0))))
  }

  test("top-k cut and deterministic tie-break by neighbor id") {
    // item X co-occurs once with each of Y1..Y4, all same cosine
    val rows = (1 to 4).flatMap(i => Seq((i, "X"), (i, s"Y$i")))
    val out = ItemSim.topNeighbors(rows.toDF("bk", "it"), "bk", "it",
      1L, 1L, k = 2).filter($"item" === "X")
      .orderBy($"rk").select("neighbor").as[String].collect().toSeq
    assert(out == Seq("Y1", "Y2"))
  }

  test("support and pair-count pruning exclude rare items") {
    val rows = Seq((1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"),
      (3, "R")) // R has support 1
    val out = ItemSim.topNeighbors(rows.toDF("bk", "it"), "bk", "it",
      minSupport = 2L, minPairCount = 2L, k = 5)
    assert(out.filter($"item" === "R" || $"neighbor" === "R").count() == 0)
    assert(out.filter($"item" === "A" && $"neighbor" === "B").count() == 1)
  }

  test("duplicate (basket,item) rows collapse before counting") {
    val rows = Seq((1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B"))
    val out = ItemSim.topNeighbors(rows.toDF("bk", "it"), "bk", "it",
      1L, 1L, 5).filter($"item" === "A" && $"neighbor" === "B").head()
    assert(out.getLong(2) == 2L) // pair count 2, not 3
  }
}
