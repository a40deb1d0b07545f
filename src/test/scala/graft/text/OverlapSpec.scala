package graft.text

import graft.SparkSuite

class OverlapSpec extends SparkSuite {
  import spark.implicits._

  test("verbatimSpans: localizes the longest verbatim run, counts " +
    "anchor hits, ignores sub-k overlaps") {
    val eva = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (200L, "completely unrelated benchmark question here")
    ).toDF("eid", "text")
    val corpus = Seq(
      // 10-token verbatim copy of eval 100 embedded mid-document
      (1L, "intro words then the quick brown fox jumps over the lazy " +
        "dog tonight and more trailing text"),
      // only a 3-token fragment (< k+? spans need >= k tokens): with
      // k=4 a 3-token overlap produces NO shared anchor
      (2L, "the quick brown cat sleeps"),
      // two separate 4-token runs from eval 100 on the same diagonal
      // with a gap between them: two 1-anchor islands, span stays 4
      (3L, "the quick brown fox xx over the lazy dog yy")
    ).toDF("cid", "text")
    val got = Overlap.verbatimSpans(corpus, "cid", "text",
        eva, "eid", "text", k = 4, maxAnchorDf = 20L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // doc 1: 10-token run -> 7 anchors on one diagonal, span 10
    assert(got((1L, 100L)) == ((7L, 10L)), s"got ${got.get((1L, 100L))}")
    // doc 3: two 4-token runs -> two 1-anchor islands on diagonal 0,
    // 2 hits total, max span = 1 + 3 = 4
    assert(got((3L, 100L)) == ((2L, 4L)), s"got ${got.get((3L, 100L))}")
    // doc 2 shares no 4-gram; eval 200 matches nothing
    assert(!got.contains((2L, 100L)))
    assert(!got.keys.exists(_._2 == 200L))
  }

  test("verbatimSpans: the corpus df cap drops boilerplate anchors") {
    val eva = Seq((9L, "standard header line for every document " +
      "in this corpus")).toDF("eid", "text")
    // the same header appears in 5 corpus docs -> df 5 per anchor
    val corpus = (1L to 5L).map(i =>
      (i, s"standard header line for every document in this corpus " +
        s"body $i")).toDF("cid", "text")
    val capped = Overlap.verbatimSpans(corpus, "cid", "text",
      eva, "eid", "text", k = 4, maxAnchorDf = 4L)
    assert(capped.count() == 0, "df-capped anchors must not match")
    val uncapped = Overlap.verbatimSpans(corpus, "cid", "text",
      eva, "eid", "text", k = 4, maxAnchorDf = 5L)
    assert(uncapped.count() == 5)
  }
}
