package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.gfunctions._

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("tokens splits on whitespace and drops empties") {
    val df = Seq("  a  b\tc ", "", "x").toDF("t")
    val got = df.select(TextAnalysis.tokens($"t")).as[Seq[String]].collect()
    assert(got(0) == Seq("a", "b", "c"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("x"))
  }

  test("tokenCount matches tokens size") {
    val df = Seq("one two three", "", " padded  out ").toDF("t")
    val got = df.select(TextAnalysis.tokenCount($"t")).as[Int].collect()
    assert(got.toSeq == Seq(3, 0, 2))
  }

  test("shingles: n-grams, short docs empty") {
    val df = Seq("a b c d", "a b").toDF("t")
    val got = df.select(
      TextAnalysis.shingles(TextAnalysis.tokens($"t"), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
  }

  test("langId picks argmax marker language, und when no votes") {
    val df = Seq(
      "the cat is on the mat",     // en
      "der hund und die katze",    // de
      "qqq www zzz").toDF("t")     // no markers
    val got = df.select(TextAnalysis.langId(TextAnalysis.tokens($"t")))
      .as[String].collect()
    assert(got.toSeq == Seq("en", "de", "und"))
  }

  test("quality metrics on a known doc") {
    val df = Seq((1L, "the quick brown fox 99")).toDF("id", "text")
    val row = TextAnalysis.withQuality(df, "text").collect()(0)
    assert(row.getAs[Long]("n_tokens") == 5)
    // 18 non-ws chars / 5 tokens
    assert(approx(row.getAs[Double]("mean_token_len"), 3.6))
    // alpha chars = 16 of 22 chars
    assert(approx(row.getAs[Double]("alpha_ratio"), 16.0 / 22, 1e-4))
    assert(approx(row.getAs[Double]("digit_ratio"), 2.0 / 22, 1e-4))
    // one 'the' in 5 tokens
    assert(approx(row.getAs[Double]("stopword_ratio"), 0.2))
    val q = row.getAs[Double]("quality_score")
    assert(q > 0 && q <= 1)
  }

  test("gopherFilter: each rule gates the doc it should") {
    // crafted failures, one per rule (thresholds: >=3 words, mean len
    // [3,10], alpha>=0.6, >=1 stopword hit, rep ratio <= 0.5)
    val good = "the quick brown foxes jumped over a lazily sleeping dog"
    val docs = Seq(
      (0L, good),                                    // passes all
      (1L, "the dog"),                               // too few words
      (2L, "a is of by up the an we he it"),         // mean len < 3
      (3L, "the 11 22 33 44 55 66 77 88 99"),        // alpha ratio low
      (4L, "zebra quokka wombat numbat dingo koala"),// no stopwords
      (5L, "the cat sat the cat sat the cat sat the cat sat") // repetitive
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFilter(docs, "text", minWords = 3,
        maxWords = 100, minMeanLen = 3.0, maxMeanLen = 10.0,
        minAlphaRatio = 0.6, minStopHits = 1, maxRepRatio = 0.5)
      .select("doc_id", "rule_word_count", "rule_mean_word_len",
        "rule_alpha", "rule_stopwords", "rule_repetition", "gopher_keep")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(got(0L) == ((true, true, true, true, true, true)))
    assert(!got(1L)._1 && !got(1L)._6)
    assert(!got(2L)._2 && !got(2L)._6)
    assert(!got(3L)._3 && !got(3L)._6)
    assert(!got(4L)._4 && !got(4L)._6)
    assert(!got(5L)._5 && !got(5L)._6)
  }

  test("gateSweep: suffix-sum survivors per threshold bucket") {
    val df = Seq(0.12, 0.14, 0.31, 0.47, 0.48, 0.93).toDF("quality_score")
    val got = TextAnalysis.gateSweep(df, "quality_score", step = 0.1)
      .as[(Double, Long, Long)].collect().toSeq
    // buckets: 0.1 -> 2 docs, 0.3 -> 1, 0.4 -> 2, 0.9 -> 1; n_keep is the
    // count surviving score >= threshold
    assert(got == Seq((0.1, 2L, 6L), (0.3, 1L, 4L), (0.4, 2L, 3L),
      (0.9, 1L, 1L)))
  }

  test("normalizeText: NFC composes, lowercases, collapses whitespace, trims") {
    // "cafe" + U+0301 combining acute (decomposed) must compose to the
    // single-codepoint é and then equal the composed input's result
    val df = Seq(
      (1L, "  CAFE  café "),
      (2L, "café café"),    // composed vs decomposed in one doc
      (3L, "ALready\tnormal   text"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.normalizeText(df, "text")
      .select($"doc_id", $"text_norm").as[(Long, String)].collect().toMap
    assert(got(1L) == "cafe café")
    assert(got(2L) == "café café")
    assert(got(3L) == "already normal text")
    // idempotent: normalizing the normalized column is a no-op
    val twice = TextAnalysis.normalizeText(
      TextAnalysis.normalizeText(df, "text")
        .select($"doc_id", $"text_norm".as("text")), "text")
      .select($"doc_id", $"text_norm").as[(Long, String)].collect().toMap
    assert(twice == got)
  }

  test("rolling fingerprint is order-sensitive, md5 fingerprint is not") {
    val df = Seq("a b c", "c b a").toDF("t")
    val fp = TextAnalysis.withFingerprints(df, "t").collect()
    assert(fp(0).getAs[Long]("fingerprint_rolling") !=
      fp(1).getAs[Long]("fingerprint_rolling"))
    assert(fp(0).getAs[String]("fingerprint_md5") !=
      fp(1).getAs[String]("fingerprint_md5"))
    val same = Seq("a b c", "a b c").toDF("t")
    val fp2 = TextAnalysis.withFingerprints(same, "t").collect()
    assert(fp2(0).getAs[Long]("fingerprint_rolling") ==
      fp2(1).getAs[Long]("fingerprint_rolling"))
  }

  test("bpeTokenCount: contractions, letter/digit/punct runs") {
    val df = Seq(
      "it's done",          // it + 's + (space)done = 3
      "abc123,,",           // abc + 123 + ,, = 3
      "hello world",        // 2
      "").toDF("t")
    val got = df.select(TextAnalysis.bpeTokenCount($"t")).as[Int].collect()
    assert(got.toSeq == Seq(3, 3, 2, 0))
  }

  test("native word_shingles matches the declarative shingles exactly") {
    val texts = Seq("a b c d e f", "one two", "", "  padded   out  x y z ",
      "exact five token doc here")
    val df = texts.toDF("t")
    val declarative = df.select(
      TextAnalysis.shingles(TextAnalysis.tokens($"t"), 3)).as[Seq[String]].collect()
    val native = df.select(word_shingles($"t", 3)).as[Seq[String]].collect()
    assert(native.toSeq == declarative.toSeq)
  }

  test("minhash_hashes equals md5_long of 'i:shingle' per index") {
    val df = Seq("the quick brown", "x y z").toDF("s")
    val viaKernel = df.select(minhash_hashes($"s", 4)).as[Seq[Long]].collect()
    val viaConcat = (0 until 4).map { i =>
      df.select(md5_long(concat(lit(s"$i:"), $"s"))).as[Long].collect()
    }
    for (r <- 0 until 2; i <- 0 until 4)
      assert(viaKernel(r)(i) == viaConcat(i)(r), s"row $r hash $i")
  }

  test("repetition signals: repeated trigrams and dominant-token share") {
    val df = Seq(
      (1L, "a b c a b c a b c"),      // trigrams: 7 total, 3 distinct
      (2L, "all words here are fully distinct tokens"),
      (3L, "x"),                       // < 3 tokens -> ratio 0
      (4L, "")).toDF("id", "text")
    val got = TextAnalysis.withRepetition(df, "text", n = 3)
      .select("id", "rep_ngram_ratio", "top_token_ratio")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx(got(1L)._1, 1.0 - 3.0 / 7.0, 1e-3))
    assert(approx(got(1L)._2, 3.0 / 9.0, 1e-3))    // 'a' x3 of 9 tokens
    assert(got(2L)._1 == 0.0)
    assert(approx(got(2L)._2, 1.0 / 7.0, 1e-3))
    assert(got(3L) == (0.0, 1.0))
    assert(got(4L) == (0.0, 0.0))
  }

  test("quality counts are per code point: surrogate pairs count once") {
    // "😀😀 ab": regex '\S' counts code points (2 emoji + a + b = 4);
    // a UTF-16 charAt loop would report 6
    val got = Seq("😀😀 ab").toDF("t")
      .select(text_quality_counts($"t", Seq("the")))
      .as[Seq[Int]].collect().head
    assert(got == Seq(2, 4, 2, 0, 0),
      s"[nTok, nonWs, alpha, digit, stop] = $got")
  }

  test("stripMarkup: tags, script/style bodies, comments, entities") {
    val docs = Seq(
      (1L, "<p class=\"x\">Hello <b>world</b></p>"),
      (2L, "<script>var a = 1 < 2;</script>after"),   // bare '<' inside script
      (3L, "<style media=\"all\">p{}</style>text"),
      (4L, "<!-- hidden -->shown"),
      (5L, "a &lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39;&nbsp;b"),
      (6L, "no markup at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stripMarkup(docs, "text")
      .select("doc_id", "text_plain").as[(Long, String)].collect().toMap
    assert(got(1L) == "Hello world")
    assert(got(2L) == "after")
    assert(got(3L) == "text")
    assert(got(4L) == "shown")
    // one unescape level per pass: &amp;amp; -> &amp;
    assert(got(5L) == "a <tag> &amp; \"q\" 's' b")
    assert(got(6L) == "no markup at all")
  }

  test("stripMarkup: a </style> inside a script string cannot close the script") {
    val docs = Seq(
      (1L, "<script>var s = \"</style>\"; track()</script>Hello"),
      (2L, "<style>s { content: \"</script>\" }</style>World")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stripMarkup(docs, "text")
      .select("doc_id", "text_plain").as[(Long, String)].collect().toMap
    assert(got(1L) == "Hello")
    assert(got(2L) == "World")
  }

  test("md5_long matches DuckDB md5_number_lower reference values") {
    // Reference values from `select md5_number_lower(...)` in DuckDB 1.0,
    // reinterpreted as signed 64-bit.
    val expected = Map(
      "abc" -> 8250560606382298838L,
      "hello" -> java.lang.Long.parseUnsignedLong("10575884659879408057"),
      "x" -> java.lang.Long.parseUnsignedLong("11990653779475613941"))
    val df = expected.keys.toSeq.toDF("s")
    val got = df.select($"s", md5_long($"s")).as[(String, Long)].collect().toMap
    expected.foreach { case (k, v) => assert(got(k) == v, s"hash of $k") }
  }

  test("templateMiner: digit/hex masking collapses log lines to " +
    "ranked templates") {
    val docs = Seq(
      (1L, "req 123 took 45ms\nreq 999 took 7ms\nboot ok"),
      (2L, "req 5 took 1ms\nsession deadbeef99 closed"))
      .toDF("id", "text")
    val got = TextAnalysis.templateMiner(docs, "id", "text", topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_docs"),
          r.getAs[Int]("rank")))).toMap
    assert(got("req # took #ms") == ((3L, 2L, 1)))
    assert(got("session @ closed") == ((1L, 1L, 3)))
    assert(got("boot ok")._1 == 1L)
  }

  test("scriptProfile: per-script letter counts and the mixed flag") {
    val docs = Seq((1L, "hello мир 123"), (2L, "plain ascii"),
      (3L, "αβ")).toDF("id", "text")
    val got = TextAnalysis.scriptProfile(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getBoolean(5)))).toMap
    assert(got(1L) == ((5, 3, 0, 3, true)))
    assert(got(2L) == ((10, 0, 0, 0, false)))
    assert(got(3L) == ((0, 0, 2, 0, false)))
  }
}
