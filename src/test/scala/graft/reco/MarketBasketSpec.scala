package graft.reco

import graft.SparkSuite

class MarketBasketSpec extends SparkSuite {
  import spark.implicits._

  test("liftPairs matches brute force on a small basket set") {
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{b,c} 5:{a} 6:{a,a,b} (dup row)
    val rows = Seq(
      (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"),
      (3, "a"), (3, "b"),
      (4, "b"), (4, "c"),
      (5, "a"),
      (6, "a"), (6, "a"), (6, "b"))
    val df = rows.toDF("bk", "it")
    val got = MarketBasket.liftPairs(df, "bk", "it",
        minSupport = 2L, minPairCount = 2L)
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    // supports: a=5, b=5, c=2; nBaskets=6
    // pairs: (a,b)=4, (a,c)=1 (dropped by minPairCount), (b,c)=2
    // confidence(a→b) = 4/5 = 0.8, lift = 4·6/(5·5) = 0.96
    // confidence(b→c) = 2/5 = 0.4, lift = 2·6/(5·2) = 1.2
    val expected = Seq(
      ("a", "b", 4L, 0.8, 0.96),
      ("b", "c", 2L, 0.4, 1.2))
    assert(got == expected)
  }

  test("tripleRules: hand-counted triples with rule confidence") {
    // baskets: 1:{a,b,c} 2:{a,b,c} 3:{a,b,c,d} 4:{a,b,d} 5:{a,b}
    val rows = Seq(
      (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"), (2, "c"),
      (3, "a"), (3, "b"), (3, "c"), (3, "d"),
      (4, "a"), (4, "b"), (4, "d"),
      (5, "a"), (5, "b"))
    val got = MarketBasket.tripleRules(rows.toDF("bk", "it"), "bk", "it",
        minItemSupport = 1L, minTripleCount = 2L)
      .orderBy("item_a", "item_b", "item_c")
      .as[(String, String, String, Long, Long, Double)].collect().toSeq
    // triples: abc=3, abd=2, acd=1 (pruned), bcd=1 (pruned)
    // pair ab=5 → conf(ab→c)=0.6, conf(ab→d)=0.4
    assert(got == Seq(
      ("a", "b", "c", 3L, 5L, 0.6),
      ("a", "b", "d", 2L, 5L, 0.4)))
  }

  test("tripleRules: duplicate basket rows collapse before counting") {
    val rows = Seq((1, "a"), (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"), (2, "c"))
    val got = MarketBasket.tripleRules(rows.toDF("bk", "it"), "bk", "it",
        minItemSupport = 1L, minTripleCount = 1L)
      .as[(String, String, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", "b", "c", 2L, 2L, 1.0)))
  }

  test("minSupport prunes items before pairing") {
    // c appears in only 1 basket; with minSupport=2 no c-pair survives
    // even though (a,c) co-occurs once
    val df = Seq((1, "a"), (1, "c"), (2, "a"), (2, "b"), (3, "a"), (3, "b"))
      .toDF("bk", "it")
    val got = MarketBasket.liftPairs(df, "bk", "it",
        minSupport = 2L, minPairCount = 1L)
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("a", "b", 2L, 0.6667, 1.0)))
  }

  test("maxBasketItems: a generous cap is a no-op; a tight cap drops " +
    "the hot basket's pairs") {
    val rows = Seq(
      (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"),
      (3, "a"), (3, "b"),
      (4, "b"), (4, "c"))
    val df = rows.toDF("bk", "it")
    def run(cap: Option[Int]) =
      MarketBasket.liftPairs(df, "bk", "it", minSupport = 2L,
          minPairCount = 1L, maxBasketItems = cap)
        .orderBy("item_a", "item_b")
        .as[(String, String, Long, Double, Double)].collect().toSeq
    // cap above every basket size: identical to uncapped
    assert(run(Some(10)) == run(None))
    // cap of 2 drops basket 1 ({a,b,c}); pairs recount without it:
    // supports unchanged (computed pre-cap), (a,b)=2, (b,c)=1
    val capped = run(Some(2))
    assert(capped.map(p => (p._1, p._2, p._3)) ==
      Seq(("a", "b", 2L), ("b", "c", 1L)))
  }

  test("tripleRules: maxBasketItems parity and capping") {
    val rows = Seq(
      (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"), (2, "c"),
      (3, "a"), (3, "b"))
    val df = rows.toDF("bk", "it")
    def run(cap: Option[Int]) =
      MarketBasket.tripleRules(df, "bk", "it", minItemSupport = 2L,
          minTripleCount = 1L, maxBasketItems = cap)
        .as[(String, String, String, Long, Long, Double)]
        .collect().toSeq
    assert(run(Some(10)) == run(None))
    assert(run(Some(2)).isEmpty) // both 3-item baskets dropped
  }
}
