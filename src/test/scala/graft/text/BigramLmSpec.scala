package graft.text

import graft.SparkSuite

class BigramLmSpec extends SparkSuite {
  import spark.implicits._

  test("bigram LM matches a hand-computed corpus") {
    // corpus: d1 = "a b a b", d2 = "a b c"
    // bigrams: d1: "a b"x2, "b a"x1 ; d2: "a b", "b c"
    // c("a b")=3, c("b a")=1, c("b c")=1 ; c_u: a=3, b=3, c=1 ; V=3
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = CorpusStats.bigramLogPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def nlp(cb: Long, cu: Long): Double = -math.log((cb + 1.0) / (cu + 3.0))
    val d1 = (2 * nlp(3, 3) + 1 * nlp(1, 3)) / 3.0
    val d2 = (nlp(3, 3) + nlp(1, 3)) / 2.0
    def r4(v: Double) = BigDecimal(v).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L).getAs[Long]("n_bigrams") == 3)
    assert(out(1L).getAs[Double]("bigram_logppl") == r4(d1))
    assert(out(2L).getAs[Double]("bigram_logppl") == r4(d2))
  }

  test("single-token and empty docs drop out") {
    val df = Seq((1L, "hello"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val ids = CorpusStats.bigramLogPerplexity(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(3L))
  }

  test("repeated fluent bigrams score lower surprise than shuffled") {
    val fluent = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val shuffled = Seq((100L, "mat the on sat cat the"))
    val df = (fluent ++ shuffled).toDF("doc_id", "text")
    val out = CorpusStats.bigramLogPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("bigram_logppl"))
      .toMap
    assert(out(1L) < out(100L))
  }
}
