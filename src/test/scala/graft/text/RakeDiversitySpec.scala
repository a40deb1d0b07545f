package graft.text

import graft.SparkSuite

class RakeDiversitySpec extends SparkSuite {
  import spark.implicits._

  test("rakeKeywords: hand-scored two-phrase corpus") {
    // doc: "deep learning is deep learning of machines"
    // stopwords {is, of}: phrases "deep learning" (x2), "machines"
    // freq: deep 2, learning 2, machines 1; deg: deep 4, learning 4,
    // machines 1 → scores 2, 2, 1
    // phrase scores: "deep learning" = 4, "machines" = 1
    val docs = Seq((1L, "deep learning is deep learning of machines"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.rakeKeywords(docs, "doc_id", "text",
        Seq("is", "of"), maxPhraseLen = 3, topK = 10)
      .orderBy("rank")
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(r == Seq(
      ("deep learning", 2L, 2L, 4.0, 1L),
      ("machines", 1L, 1L, 1.0, 2L)))
  }

  test("rakeKeywords: phrases longer than maxPhraseLen are dropped") {
    val docs = Seq((1L, "a b c d of x y")).toDF("doc_id", "text")
    val r = TextAnalysis.rakeKeywords(docs, "doc_id", "text",
        Seq("of"), maxPhraseLen = 3, topK = 10)
      .select("phrase").as[String].collect().toSet
    assert(r == Set("x y"))   // "a b c d" has 4 words -> dropped
  }

  test("diversityIndexes: uniform vs concentrated strata") {
    // s1: four distinct words → H = ln 4, simpson = 0
    // s2: one word four times → H = 0, simpson = 1
    val docs = Seq(("s1", "a b c d"), ("s2", "x x x x"))
      .toDF("source", "text")
    val r = CorpusStats.diversityIndexes(docs, "source", "text")
      .orderBy("stratum")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect()
    assert(r(0)._2 == 4L && r(0)._4 == math.rint(math.log(4) * 1e4) / 1e4)
    assert(r(0)._6 == 0.0 && r(0)._7 == 4.0)
    assert(r(1)._2 == 1L && r(1)._4 == 0.0 && r(1)._6 == 1.0
      && r(1)._7 == 1.0)
  }
}
