package graft.text

import graft.SparkSuite

class CorpusStatsSpec extends SparkSuite {
  import spark.implicits._

  test("tokenDivergence: uniform strata diverge by zero") {
    val docs = Seq(
      ("s0", "x y x y"),
      ("s1", "x y x y")).toDF("source", "text")
    val got = CorpusStats.tokenDivergence(docs, "source", "text")
      .select("stratum", "n_tokens", "n_terms", "kl_divergence")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set("s0", "s1"))
    // both strata match the blend exactly -> KL = 0
    assert(got.values.forall { case (n, t, kl) =>
      n == 4L && t == 2L && kl == 0.0 })
  }

  test("tokenDivergence: hand-computed two-stratum KL") {
    // s0: a a a b (p_a=3/4, p_b=1/4); s1: a b b b (p_a=1/4, p_b=3/4)
    // blend: p_a = p_b = 1/2 -> KL(s0) = KL(s1)
    //   = 0.75 ln(1.5) + 0.25 ln(0.5) = 0.130812...
    val docs = Seq(("s0", "a a a b"), ("s1", "a b b b"))
      .toDF("source", "text")
    val got = CorpusStats.tokenDivergence(docs, "source", "text")
      .select("stratum", "kl_divergence").as[(String, Double)]
      .collect().toMap
    val want = 0.75 * math.log(1.5) + 0.25 * math.log(0.5)
    assert(approx(got("s0"), want, 1e-4))
    assert(approx(got("s1"), want, 1e-4))
  }

  test("unigramLogPerplexity: hand-computed smoothed scores") {
    // corpus: d1 = "a a b", d2 = "c" -> counts a:2 b:1 c:1, N=4, V=3
    // p(a)=3/7, p(b)=2/7, p(c)=2/7
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val got = CorpusStats.unigramLogPerplexity(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "logppl")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val d1 = (2 * -math.log(3.0 / 7) + 1 * -math.log(2.0 / 7)) / 3
    val d2 = -math.log(2.0 / 7)
    assert(got(1L)._1 == 3L && approx(got(1L)._2, d1, 1e-4))
    assert(got(2L)._1 == 1L && approx(got(2L)._2, d2, 1e-4))
  }

  test("unigramLogPerplexity: rare-token docs score higher than common-token docs") {
    val docs = Seq((1L, "the the the the"), (2L, "zq")).toDF("doc_id", "text")
    val got = CorpusStats.unigramLogPerplexity(docs, "doc_id", "text")
      .select("doc_id", "logppl").as[(Long, Double)].collect().toMap
    assert(got(2L) > got(1L))
  }

  test("perplexityBuckets: thirds by fluency, head = lowest logppl, " +
    "auto dispatch equals forced exact on small input") {
    // 30 docs: 10 of a very common token, 10 mixed, 10 of rare tokens —
    // scores separate into three clear tiers
    val docs = ((1 to 10).map(i => (i.toLong, "aa aa aa aa")) ++
      (11 to 20).map(i => (i.toLong, "aa bb cc")) ++
      (21 to 30).map(i => (i.toLong, s"zz$i yy$i"))).toDF("doc_id", "text")
    val b = CorpusStats.perplexityBuckets(docs, "doc_id", "text")
      .select("doc_id", "logppl", "bucket")
      .as[(Long, Double, String)].collect()
    val byBucket = b.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    assert(b.count(_._3 == "head") == 10)
    val exact = CorpusStats.perplexityBuckets(docs, "doc_id", "text",
      exactCuts = Some(true)).select("doc_id", "bucket")
      .as[(Long, String)].collect().sorted.toSeq
    val auto = b.map(r => (r._1, r._3)).sorted.toSeq
    assert(auto == exact)
  }

  test("pmiPairs: hand-computed association, df band excludes stopwords") {
    // 10 docs: "x y" always co-occur in 4 docs; "s" in every doc
    // (stopword, df 10 > maxTermDocs 9); "q" only once (df < min 2)
    val docs = ((1 to 4).map(i => (i.toLong, "x y s")) ++
      (5 to 9).map(i => (i.toLong, "z s")) :+ ((10L, "q s")))
      .toDF("doc_id", "text")
    val got = CorpusStats.pmiPairs(docs, "doc_id", "text",
      minTermDocs = 2, maxTermDocs = 9, minPairDocs = 2, k = 10)
      .select("term_a", "term_b", "n_pair_docs", "pmi")
      .as[(String, String, Long, Double)].collect()
    // only x-y survives: s df-banded out, q below min df, z pairs with
    // nothing surviving
    assert(got.length == 1)
    val (a, bTerm, n, pmi) = got.head
    assert(a == "x" && bTerm == "y" && n == 4L)
    // PMI = ln(4 * 10 / (4 * 4))
    assert(approx(pmi, math.log(40.0 / 16.0), 1e-4))
  }

  test("strataSimilarityMatrix: identical strata cosine 1, disjoint 0") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "a b c"), ("s2", "a b c"),      // identical distributions
      ("s3", "x y z")                        // disjoint vocabulary
    ).toDF("src", "text")
    val got = CorpusStats.strataSimilarityMatrix(docs, "src", "text")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("s1", "s2")) == 1.0)
    // disjoint pairs produce no shared-term rows at all
    assert(!got.contains(("s1", "s3")) && !got.contains(("s2", "s3")))
  }

  test("strataSimilarityMatrix: hand-computed partial overlap") {
    import spark.implicits._
    // s1: a(2), b(1); s2: a(1), c(1). dot = 2, norms sqrt5, sqrt2.
    val docs = Seq(("s1", "a a b"), ("s2", "a c")).toDF("src", "text")
    val got = CorpusStats.strataSimilarityMatrix(docs, "src", "text")
      .as[(String, String, Double)].head()
    assert(got._3 == BigDecimal(2.0 / math.sqrt(10.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("tokenEntropy: uniform maximal, degenerate zero") {
    import spark.implicits._
    val docs = Seq(
      ("u", "a b c d"),      // uniform over 4 types: H = ln 4
      ("z", "a a a a")       // single type: H = 0
    ).toDF("src", "text")
    val got = CorpusStats.tokenEntropy(docs, "src", "text")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(("u")) == ((4L, 4L,
      BigDecimal(math.log(4.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(("z")) == ((1L, 4L, 0.0)))
  }

  test("vocabCoverage: cumulative token share at each grid point") {
    import spark.implicits._
    // counts: a=3, b=1, c=1 (rank a, b, c by freq desc / term asc)
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = CorpusStats.vocabCoverage(docs, "text", Seq(1, 2, 10))
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(r == Seq((1, 1L, 3L, 0.6), (2, 2L, 4L, 0.8),
      (10, 3L, 5L, 1.0)))
  }

  test("novelBigramRate: df-1 bigrams over distinct doc bigrams") {
    import spark.implicits._
    // d1 {x y, y z}, d2 {x y, y w}: "x y" df=2, others df=1
    val docs = Seq((1L, "x y z"), (2L, "x y w")).toDF("doc_id", "text")
    val r = CorpusStats.novelBigramRate(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)))
  }
}
