package graft.text

import graft.SparkSuite

class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  test("chunk: overlapping windows, no redundant tail, empty doc dropped") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),  // 10 tokens
      (2L, "a b"),                               // fits one chunk
      (3L, "")).toDF("doc_id", "text")
    val got = Chunking.chunk(docs, "doc_id", "text", chunkTokens = 8, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val byDoc = got.groupBy(_._1)
    // doc1: starts 0 and 6 (6+2 < 10); chunk 2 holds tokens 7..10
    assert(byDoc(1L).toSeq.sortBy(_._2) == Seq(
      (1L, 0, "t1 t2 t3 t4 t5 t6 t7 t8", 8),
      (1L, 1, "t7 t8 t9 t10", 4)))
    assert(byDoc(2L).toSeq == Seq((2L, 0, "a b", 2)))
    assert(!byDoc.contains(3L))
    // an exactly-chunk-sized doc yields ONE chunk (no redundant tail)
    val exact = Seq((9L, (1 to 8).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    assert(Chunking.chunk(exact, "doc_id", "text", 8, 2).count() == 1)
  }

  test("packSequences: seq_id bins by exclusive running token sum per stratum") {
    val docs = Seq(
      ("s1", 1L, "a b c d"),      // 4 tokens, cum_excl 0  -> seq 0
      ("s1", 2L, "a b c d e f"),  // 6 tokens, cum_excl 4  -> seq 0
      ("s1", 3L, "a b c"),        // 3 tokens, cum_excl 10 -> seq 1
      ("s2", 9L, "x y"))          // new stratum restarts  -> seq 0
      .toDF("source", "doc_id", "text")
    val got = Chunking.packSequences(docs, "source", "doc_id", "text", 10)
      .select("source", "doc_id", "seq_id")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("s1", 1L, 0L), ("s1", 2L, 0L), ("s1", 3L, 1L),
      ("s2", 9L, 0L)))
  }

  test("paddingEfficiency: buckets, padded slots, waste; empty docs excluded") {
    val docs = Seq(
      (1L, "a b c"),                            // 3 tok  -> bucket 1, pad 4
      (2L, "a b c d"),                          // 4 tok  -> bucket 2 (log2 exact), pad 4
      (3L, Seq.fill(5)("t").mkString(" ")),     // 5 tok  -> bucket 2, pad 8
      (4L, ""),                                 // empty: excluded
      (5L, Seq.fill(9)("t").mkString(" "))      // 9 tok  -> bucket 3, pad 12
    ).toDF("doc_id", "text")
    val got = Chunking.paddingEfficiency(docs, "text", seqLen = 4)
      .select("len_bucket", "bucket_lo", "n_docs", "total_tokens",
        "padded_slots", "waste_frac")
      .as[(Int, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1, 2, 3))
    assert(got(1) == ((1, 2L, 1L, 3L, 4L, 0.25)))
    // bucket 2: docs of 4 and 5 tokens -> 9 tokens in 12 slots
    assert(got(2) == ((2, 4L, 2L, 9L, 12L, 0.25)))
    assert(got(3) == ((3, 8L, 1L, 9L, 12L, 0.25)))
  }
}
