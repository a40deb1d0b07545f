package graft.text

import graft.SparkSuite

class JsdOverlapSpec extends SparkSuite {
  import spark.implicits._

  test("pairwiseJsd: identical strata diverge by 0") {
    val docs = Seq(("a", "x y z x"), ("b", "x y z x"))
      .toDF("src", "text")
    val r = CorpusStats.pairwiseJsd(docs, "src", "text").collect().head
    assert(r.getAs[Double]("jsd") == 0.0)
    assert(r.getAs[Double]("jsd_normalized") == 0.0)
  }

  test("pairwiseJsd: disjoint vocabularies hit the ln 2 ceiling") {
    val docs = Seq(("a", "p q r"), ("b", "u v w"), ("a", "p"), ("b", "u"))
      .toDF("src", "text")
    // no common terms → pair drops out of the common join entirely;
    // verify via a pair that shares ONE rare term instead
    val withBridge = docs.union(Seq(("a", "zz"), ("b", "zz"))
      .toDF("src", "text"))
    val r = CorpusStats.pairwiseJsd(withBridge, "src", "text")
      .collect().head
    assert(r.getAs[Long]("n_common_terms") == 1L)
    // nearly-disjoint distributions: jsd close to (but below) ln 2
    assert(r.getAs[Double]("jsd_normalized") >= 0.8)
    assert(r.getAs[Double]("jsd") < math.log(2.0))
  }

  test("pairwiseJsd: hand-computed two-term case") {
    // P = (.75, .25), Q = (.25, .75) over {x, y}
    val docs = Seq(("a", "x x x y"), ("b", "x y y y")).toDF("src", "text")
    val r = CorpusStats.pairwiseJsd(docs, "src", "text").collect().head
    def term(p: Double, q: Double) = p * math.log(2 * p / (p + q))
    val exp = (term(.75, .25) + term(.25, .75) +
      term(.25, .75) + term(.75, .25)) / 2
    assert(approx(r.getAs[Double]("jsd"), exp, 1e-5))
  }

  test("ngramOverlapF1: identical neighbor docs score F1 = 1") {
    val docs = Seq((1L, "the cat sat on the mat", "s"),
      (2L, "the cat sat on the mat", "s")).toDF("id", "text", "src")
    val r = CorpusStats.ngramOverlapF1(docs, "id", "text", "src", 2)
      .collect().head
    assert(r.getAs[Long]("overlap") == 5L)
    assert(r.getAs[Double]("f1") == 1.0)
    assert(r.getAs[Double]("precision") == 1.0)
    assert(r.getAs[Double]("recall") == 1.0)
  }

  test("ngramOverlapF1: disjoint docs score 0; multiset counting " +
    "caps repeated grams at the minimum") {
    val docs = Seq(
      (1L, "a b a b a b", "s"),     // "a b"×3, "b a"×2
      (2L, "a b c d", "s"),         // "a b"×1
      (3L, "x y z", "t"),
      (4L, "p q r", "t")).toDF("id", "text", "src")
    val m = CorpusStats.ngramOverlapF1(docs, "id", "text", "src", 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r)
      .toMap
    // s-block orders by length: doc2 (len 7) before doc1 (len 11)
    val sPair = m((2L, 1L))
    assert(sPair.getAs[Long]("overlap") == 1L)   // min(1, 3) for "a b"
    assert(sPair.getAs[Double]("precision") == 0.3333)
    assert(sPair.getAs[Double]("recall") == 0.2)
    val tPair = m((3L, 4L))
    assert(tPair.getAs[Long]("overlap") == 0L)
    assert(tPair.getAs[Double]("f1") == 0.0)
  }

  test("ngramOverlapF1: pairing is per block and chains by length") {
    val docs = Seq((1L, "a b", "s"), (2L, "a b c", "s"),
      (3L, "a b c d", "s")).toDF("id", "text", "src")
    val pairs = CorpusStats.ngramOverlapF1(docs, "id", "text", "src", 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)))
  }
}
