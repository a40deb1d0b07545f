package graft

import java.sql.Timestamp

import graft.dedup.Dedup
import graft.events.Sessionize
import graft.text.TextAnalysis

/** The library claims ANSI-safety (Spark 4's default): no operator may
  * rely on silent overflow, x/0 == null, or junk casts. This spec runs
  * the operator surface under an ansi=true session — guarded divisions
  * (empty docs, zero-variance groups) must return their documented
  * defaults instead of throwing. */
class AnsiSafetySpec extends SparkSuite {

  test("text, dedup, and sessionize operators run under ANSI mode") {
    val s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    import s.implicits._

    val docs = Seq((1L, "a b c a b c"), (2L, ""), (3L, "a b c a b c"),
      (4L, "   ")).toDF("doc_id", "text")
    // empty/whitespace docs exercise every division guard
    val q = TextAnalysis.withQuality(docs, "text")
      .select("doc_id", "quality_score").collect()
    assert(q.length == 4)
    val rep = TextAnalysis.withRepetition(docs, "text")
      .select("doc_id", "rep_ngram_ratio").collect()
    assert(rep.length == 4)

    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 4L))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 3L)))

    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, 2.0)   // 0-sec session
    ).toDF("event_id", "ts", "user_id", "value")
    val sess = Sessionize.sessions(events, "ts", "user_id", "value", 60L)
      .select("n_events").as[Long].collect()
    assert(sess.toSeq == Seq(2L))
  }
}
