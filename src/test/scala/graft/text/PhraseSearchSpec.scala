package graft.text

import graft.SparkSuite

class PhraseSearchSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "quick brown dogs and a quick brown fox"),
    (3L, "brown quick fox"),        // words present, order wrong
    (4L, "the quick red fox"),      // gap breaks adjacency
    (5L, "quick"),                  // partial phrase only
    (6L, "a b quick brown")).toDF("doc_id", "text")

  test("containing finds exactly the docs with the consecutive phrase") {
    val got = PhraseSearch.containing(docs, "doc_id", "text",
        Seq("quick", "brown"))
      .as[Long].collect().sorted
    assert(got.toSeq ==Seq(1L, 2L, 6L))
  }

  test("three-word phrase and repeated-occurrence docs dedupe") {
    val got = PhraseSearch.containing(docs, "doc_id", "text",
        Seq("quick", "brown", "fox"))
      .as[Long].collect().sorted
    assert(got.toSeq ==Seq(1L, 2L))
  }

  test("a word absent from the corpus yields an empty result") {
    val got = PhraseSearch.containing(docs, "doc_id", "text",
        Seq("quick", "zebra"))
      .as[Long].collect()
    assert(got.isEmpty)
  }

  test("repeated word in the phrase aligns both positions") {
    val df = Seq((1L, "go go stop"), (2L, "go stop go")).toDF("doc_id", "text")
    val got = PhraseSearch.containing(df, "doc_id", "text", Seq("go", "go"))
      .as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
