package graft.text

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** Golden-grain parity for the curation funnel (the LLM-side capstone,
  * q400) — the DrugTargetPipeline treatment: a deterministic committed
  * fixture driven through [[Curation.funnel]] and byte-compared against
  * a checked-in expected CSV, pinning the stage semantics (keep-first
  * dedup rule, quality band edges, token-mass accounting) at value
  * grain outside the oracle harness.
  *
  * The fixture exercises every funnel branch:
  *  - exact duplicates WITHIN a source (keep-first by doc_id);
  *  - a cross-source copy (the copying source, higher doc_id, is
  *    charged the duplicate — the original survives);
  *  - too-short (< minTok), too-long (> maxTok), and digit-heavy
  *    (≥ maxDigitRatio) documents failing quality AFTER surviving
  *    dedup;
  *  - boundary documents AT minTok and AT maxTok (inclusive band);
  *  - a digit ratio exactly AT the threshold (strict <, so rejected).
  */
class CurationGoldenSpec extends SparkSuite {
  import spark.implicits._

  // digit-free words (letter suffixes) so the digit-ratio branch is
  // driven ONLY by the explicitly digit-heavy documents below
  private def doc(n: Int, word: String = "tok"): String =
    (1 to n).map { i =>
      val a = ('a' + (i / 26) % 26).toChar
      val b = ('a' + i % 26).toChar
      s"$word$a$b"
    }.mkString(" ")

  private val fixture = Seq(
    // alpha: clean docs + an internal duplicate pair + a short doc
    ("alpha", 1L, doc(100)),                  // unique, quality
    ("alpha", 2L, doc(100)),                  // exact dup of 1 -> dropped
    ("alpha", 3L, doc(50, "alpha")),          // unique, quality
    ("alpha", 4L, doc(19)),                   // unique, too short
    ("alpha", 5L, doc(20, "edge")),           // boundary: exactly minTok
    // beta: cross-source copy of alpha's doc 3 + digit-heavy + long
    ("beta", 6L, doc(50, "alpha")),           // dup of doc 3 -> dropped
    ("beta", 7L, doc(30) + " 123456789" * 8),
    // 72 digits / 259 chars ≈ 0.278 > 0.2: digit-heavy -> rejected
    ("beta", 8L, doc(2001)),                  // too long
    ("beta", 9L, doc(2000, "big")),           // boundary: exactly maxTok
    // gamma: only quality failures -> n_quality = 0, tokens_out = 0
    ("gamma", 10L, doc(5)),
    ("gamma", 11L, "1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9 0 x"))
    .toDF("source", "doc_id", "text")

  private def asCsv(): String = {
    val rows = Curation.funnel(fixture, "source", "doc_id", "text",
      minTok = 20, maxTok = 2000, maxDigitRatio = 0.2).collect()
    "source,n_raw,n_unique,n_quality,tokens_out\n" + rows.map(r =>
      Seq(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)).mkString(",")).mkString("", "\n", "\n")
  }

  test("curation funnel: byte-identical to the committed golden CSV") {
    val goldenPath = Paths.get(
      getClass.getResource("/golden/curation_funnel.csv").toURI)
    assert(asCsv() == Files.readString(goldenPath),
      "funnel output diverged from golden/curation_funnel.csv")
  }

  test("curation funnel: stage semantics spot-checks") {
    val m = Curation.funnel(fixture, "source", "doc_id", "text",
      minTok = 20, maxTok = 2000, maxDigitRatio = 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    // alpha: 5 raw, doc 2 deduped, docs 1/3/5 quality (4 fails short)
    assert(m("alpha").getLong(1) == 5L)
    assert(m("alpha").getLong(2) == 4L)
    assert(m("alpha").getLong(3) == 3L)
    assert(m("alpha").getLong(4) == 170L) // 100 + 50 + 20
    // beta: doc 6 is charged the cross-source duplicate
    assert(m("beta").getLong(1) == 4L)
    assert(m("beta").getLong(2) == 3L)
    assert(m("beta").getLong(3) == 1L)    // only the maxTok boundary doc
    assert(m("beta").getLong(4) == 2000L)
    // gamma: survivors exist but none pass quality
    assert(m("gamma").getLong(2) == 2L)
    assert(m("gamma").getLong(3) == 0L && m("gamma").getLong(4) == 0L)
  }
}
