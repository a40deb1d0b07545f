package graft.text

import graft.SparkSuite

class RelevanceSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark query engine"),
    (2L, "query planner for the engine"),
    (3L, "totally unrelated words here"),
    (4L, "spark window query")).toDF("id", "text")

  test("tfidf: corpus-unique term outranks common terms; ties break by term") {
    val top = Relevance.tfidfTopTerms(docs, "id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(4)) -> r.getString(1)).toMap
    // doc 1: "spark" tf=2 in 2/4 docs -> 2*ln(2); "engine" 1*ln(2);
    // "query" 1*ln(4/3) -- top-2 = spark, engine
    assert(top((1L, 1)) == "spark")
    assert(top((1L, 2)) == "engine")
    // doc 3: all terms unique to it, equal tfidf -> lexicographic order
    assert(top((3L, 1)) == "here")
  }

  test("tfidf values match the formula") {
    val m = Relevance.tfidfTopTerms(docs, "id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(approx(m((1L, "spark")), math.rint(2 * math.log(4.0 / 2) * 1e4) / 1e4, 1e-9))
    assert(approx(m((2L, "planner")), math.rint(math.log(4.0 / 1) * 1e4) / 1e4, 1e-9))
  }

  test("bm25: duplicate query terms do not inflate document frequency") {
    val once = Relevance.bm25TopDocs(docs, "id", "text", Seq("spark", "query"), 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dup = Relevance.bm25TopDocs(docs, "id", "text",
        Seq("spark", "spark", "query"), 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(once == dup, s"once=$once dup=$dup")
  }

  test("bm25: empty corpus returns an empty frame, not an NPE") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Relevance.bm25TopDocs(empty, "id", "text", Seq("x"), 5).count() == 0)
    val blank = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
    assert(Relevance.bm25TopDocs(blank, "id", "text", Seq("x"), 5).count() == 0)
  }

  test("bm25: docs containing more query terms with shorter length rank higher") {
    val got = Relevance.bm25TopDocs(docs, "id", "text",
        Seq("spark", "query"), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // every returned doc contains a query term; doc 3 (no terms) absent
    assert(!got.exists(_._1 == 3L))
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.reverse.toSeq)
    // doc 4 (both terms, short) beats doc 2 (one term)
    val byId = got.toMap
    assert(byId(4L) > byId(2L))
  }
}
