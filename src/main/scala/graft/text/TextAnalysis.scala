package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.gfunctions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, language-ID (marker-word heuristic),
  * quality scoring, and document fingerprinting. Everything is a pure
  * column expression (codegen-friendly, no UDFs), computed in a single
  * narrow pass over the documents table — no shuffle at all until a
  * downstream aggregate asks for one, so the operators scale linearly
  * with input splits at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (split of "" yields [""]). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > lit(0))

  /** Token count without materializing the token array. */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish token segmentation (GPT-2-style classes without lookahead,
    * so the same pattern runs under Java regex and RE2): common English
    * contractions, optionally space-prefixed letter runs, digit runs,
    * and punctuation runs. Whitespace itself is not a token. */
  val BpeishPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** Approximate LLM-token count: matches of [[BpeishPattern]]. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishPattern))

  /** Word n-gram shingles of a token array; fewer than n tokens → empty
    * (guard needed: sequence(0, negative) would count down). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Marker-word vocabularies for the language-ID heuristic. Real systems
    * use char-n-gram models; the heuristic keeps the same operator shape
    * (per-language evidence score -> argmax) with an exactly reproducible
    * scoring rule. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and", "of"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Per-language marker hit count over a token array. */
  def langScore(toks: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(filter(toks, t => t.isInCollection(markers)))
  }

  /** Predicted language: argmax of marker votes, ties broken by language
    * code order, no votes at all → "und". */
  def langId(toks: Column): Column = {
    val scored = langMarkers.map { case (l, _) => (l, langScore(toks, l)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scored.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
    // foldRight makes the FIRST matching language win (ties -> earliest
    // in langMarkers order, which is sorted except zh; markers are
    // disjoint enough that exact ties are rare and deterministic).
    pick
  }

  /** Quality metrics in one projection: token count, mean token length,
    * alpha-char ratio, digit ratio, stopword ratio, and a weighted score
    * in [0,1]. Mirrors the length/punct/stopword heuristics used by
    * LLM-corpus quality filters. All five counts come from ONE native
    * single-pass kernel call (`text_quality_counts`) — the regexp_count
    * route materializes a match array per metric and its CASE-branch
    * duplicates escape subexpression elimination, costing ~10 regex scans
    * per row. */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val cnt = text_quality_counts(t, langMarkers.toMap.apply("en"))
    val nTok = element_at(cnt, 1).cast("double")
    val nonWs = element_at(cnt, 2).cast("double")
    val alpha = element_at(cnt, 3).cast("double")
    val digit = element_at(cnt, 4).cast("double")
    val stop = element_at(cnt, 5).cast("double")
    val nChars = length(t).cast("double")
    val meanTokLen =
      when(nTok > 0, round(nonWs / nTok, 4)).otherwise(0.0)
    val stopRatio = when(nTok > 0, round(stop / nTok, 4)).otherwise(0.0)
    val alphaRatio = when(nChars > 0, round(alpha / nChars, 4)).otherwise(0.0)
    val digitRatio = when(nChars > 0, round(digit / nChars, 4)).otherwise(0.0)
    // Weighted quality: favor alpha-heavy text with a sane token-length
    // band and some (but not excessive) stopword presence.
    val lenOk = (meanTokLen >= 2.0 && meanTokLen <= 12.0).cast("double")
    val score = round(
      lit(0.4) * alphaRatio + lit(0.3) * lenOk +
        lit(0.2) * least(stopRatio * 5.0, lit(1.0)) +
        lit(0.1) * (lit(1.0) - least(digitRatio * 10.0, lit(1.0))), 4)
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("mean_token_len", meanTokLen)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("digit_ratio", digitRatio)
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("quality_score", score)
  }

  /** Repetition signals (Gopher-style quality rules): the fraction of
    * repeated word n-grams per document — high values flag boilerplate,
    * keyword stuffing, and degenerate generations. One narrow projection
    * (the n-gram arrays live only inside the row's expressions, never
    * shuffled):
    *   - `rep_ngram_ratio` = 1 - distinct/total n-grams (0 when < n tokens)
    *   - `top_token_ratio` = occurrences of the most frequent token / total
    */
  def withRepetition(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    // one native kernel pass per row (the declarative
    // transform/array_distinct/filter fold is interpreted and
    // O(distinct × total) per document — 10× the whole-bench cost at
    // sf0.1 before this kernel existed)
    val cnt = repetition_counts(col(textCol), n)
    val total = element_at(cnt, 1).cast("double")
    val distinctN = element_at(cnt, 2).cast("double")
    val nTok = element_at(cnt, 3).cast("double")
    val topCount = element_at(cnt, 4).cast("double")
    df.withColumn("rep_ngram_ratio",
        when(total > 0, round(lit(1.0) - distinctN / total, 4)).otherwise(0.0))
      .withColumn("top_token_ratio",
        when(nTok > 0, round(topCount / nTok, 4)).otherwise(0.0))
  }

  /** Gopher-style hard quality GATES (the Rae et al. 2021 App. A filter
    * shape): one boolean per rule plus the combined keep decision — the
    * operator a corpus pipeline actually filters with, where
    * [[withQuality]] only scores. Layered on the same two single-pass
    * native kernels (`text_quality_counts`, `repetition_counts`), so the
    * whole gate is one narrow codegen'd projection — no shuffle, scales
    * linearly with input splits. Rules (documents version of the
    * word-level originals):
    *   - word count within [minWords, maxWords]
    *   - mean token length within [minMeanLen, maxMeanLen]
    *   - alpha-char ratio ≥ minAlphaRatio
    *   - at least minStopHits stopword occurrences
    *   - repeated-trigram ratio ≤ maxRepRatio
    * Ratio rule inputs are rounded to 4 dp BEFORE comparison so the
    * boolean boundary is engine-independent (the q35 lesson). */
  def gopherFilter(df: DataFrame, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   minAlphaRatio: Double = 0.6, minStopHits: Int = 2,
                   maxRepRatio: Double = 0.2): DataFrame = {
    val t = col(textCol)
    val cnt = text_quality_counts(t, langMarkers.toMap.apply("en"))
    val nTok = element_at(cnt, 1)
    val nonWs = element_at(cnt, 2).cast("double")
    val alpha = element_at(cnt, 3).cast("double")
    val stop = element_at(cnt, 5)
    val rep = repetition_counts(t, 3)
    val total = element_at(rep, 1).cast("double")
    val dist = element_at(rep, 2).cast("double")
    val nChars = length(t).cast("double")
    val meanLen = when(nTok > 0, round(nonWs / nTok.cast("double"), 4))
      .otherwise(0.0)
    val alphaRatio = when(nChars > 0, round(alpha / nChars, 4)).otherwise(0.0)
    val repRatio = when(total > 0, round(lit(1.0) - dist / total, 4))
      .otherwise(0.0)
    val rWords = nTok >= minWords && nTok <= maxWords
    val rMeanLen = meanLen >= minMeanLen && meanLen <= maxMeanLen
    val rAlpha = alphaRatio >= minAlphaRatio
    val rStop = stop >= minStopHits
    val rRep = repRatio <= maxRepRatio
    df.withColumn("rule_word_count", rWords)
      .withColumn("rule_mean_word_len", rMeanLen)
      .withColumn("rule_alpha", rAlpha)
      .withColumn("rule_stopwords", rStop)
      .withColumn("rule_repetition", rRep)
      .withColumn("gopher_keep",
        rWords && rMeanLen && rAlpha && rStop && rRep)
  }

  /** Quality-gate threshold sweep — the calibration table used to CHOOSE
    * a filter cutoff: for every observed score bucket (width `step`),
    * how many documents survive a `score >= bucket*step` gate. One
    * narrow scoring pass, a bucket-cardinality aggregate (map-side
    * partial; ≤ 1/step + 1 buckets regardless of corpus size), and a
    * suffix-sum window over that tiny table. The epsilon-killing
    * round(·, 6) before floor keeps bucket boundaries engine-independent
    * for 4-dp-rounded scores (the q35 lesson). Output:
    * (threshold, n_bucket, n_keep) ascending. */
  def gateSweep(df: DataFrame, scoreCol: String,
                step: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df
      .select(floor(round(col(scoreCol) / step, 6)).cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_bucket"))
    // suffix sum over the bounded bucket table (single-partition window
    // over <= 1/step + 1 rows — same documented trade as BH's small side)
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("n_keep", sum(col("n_bucket")).over(w))
      .select(round(col("bucket") * step, 2).as("threshold"),
        col("n_bucket"), col("n_keep"))
      .orderBy(col("threshold"))
  }

  /** Canonical text cleaning — the opening stage of a training-data
    * pipeline, so downstream hashes/shingles/dedup see one canonical
    * form: Unicode NFC composition (native codegen'd expression — Spark
    * has no built-in), lowercasing, whitespace collapse to single
    * spaces, and edge trim, as `text_norm`. One narrow projection, no
    * shuffle; the NFC kernel short-circuits on already-normalized
    * (ASCII) rows. DuckDB twin:
    * `trim(regexp_replace(lower(nfc_normalize(t)), '\s+', ' ', 'g'))`. */
  def normalizeText(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("text_norm",
      trim(regexp_replace(lower(nfc_normalize(col(textCol))), "\\s+", " ")))

  /** Markup strip — the extract-text step of an HTML/web-crawl ingest:
    * drops comments, script/style blocks (content and all), then every
    * remaining tag, unescapes the six ubiquitous entities, and collapses
    * the whitespace the removals leave behind, as `text_plain`. One
    * narrow codegen'd projection (regexp_replace + chained replace — no
    * UDF, no shuffle). The patterns avoid lookahead/backreferences so
    * the SAME regexes run under Java regex (Spark) and RE2 (DuckDB,
    * `regexp_replace(..., 'gs')`); entity unescape is plain string
    * replace with `&amp;` LAST so double-escaped text resolves one
    * level per pass, identically in both engines. A full HTML5 parser
    * is out of scope by design — this is the C4/CommonCrawl-style
    * regex extractor, not a DOM. */
  def stripMarkup(df: DataFrame, textCol: String): DataFrame = {
    val noComment = regexp_replace(col(textCol), "(?s)<!--.*?-->", " ")
    // script and style as SEPARATE patterns: an alternation in both the
    // open and close tag ('<(script|style)...</(script|style)>') lets a
    // <script> block be "closed" by a </style> appearing inside a JS
    // string, leaking the script tail into the extracted text. RE2 has
    // no backreferences, so two passes is the portable fix.
    val noScript = regexp_replace(noComment,
      "(?si)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?si)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    df.withColumn("text_plain",
      trim(regexp_replace(unescaped, "\\s+", " ")))
  }

  /** Content fingerprints: exact (md5 hex of normalized text, oracle-able)
    * and rolling 64-bit (order-sensitive polynomial hash, engine-native). */
  def withFingerprints(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("fingerprint_md5", md5(trim(t).cast("binary")))
      .withColumn("fingerprint_rolling", rolling_hash64(tokens(t)))
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs (lowercased, ≤ maxPhraseLen
    * words); word score = deg/freq where deg(w) = Σ phrase length over
    * occurrences and freq(w) = occurrence count; phrase score = Σ word
    * scores. Corpus-level top-k phrases by (rounded score desc,
    * phrase asc) — ranking on the ROUNDED score, the q43 discipline,
    * so libm ulps can't flip the cut.
    *
    * Scale shape: one posexplode of the token stream, one per-doc
    * position window for the gap-and-islands phrase ids, then every
    * aggregate runs at phrase/word grain (corpus-vocabulary bounded).
    * Output: (phrase, n_words, n_occurrences, score 4dp, rank).
    */
  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String], maxPhraseLen: Int,
                   topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
        posexplode(tokens(lower(col(textCol)))).as(Seq("pos", "w")))
      .withColumn("__stop", col("w").isin(stopwords: _*))
    val wOrd = Window.partitionBy(col("id")).orderBy(col("pos"))
    val phrases = toks
      .withColumn("__pid",
        sum(when(col("__stop"), 1L).otherwise(0L)).over(wOrd))
      .filter(!col("__stop"))
      .groupBy(col("id"), col("__pid"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("phrase"),
        count(lit(1)).as("len"))
      .filter(col("len") <= maxPhraseLen)
    val words = phrases.select(col("phrase"), col("len"),
      explode(split(col("phrase"), " ")).as("w"))
    val wordScores = words.groupBy(col("w"))
      .agg((sum(col("len")).cast("double") / count(lit(1))).as("__ws"))
    val distinctPhrases = phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        max(col("len")).as("n_words"))
    val scored = distinctPhrases
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wordScores, Seq("w"))
      .groupBy(col("phrase"), col("n_words"), col("n_occurrences"))
      .agg(round(sum(col("__ws")), 4).as("score"))
    // top-k FIRST (TakeOrderedAndProject — distributed per-partition
    // heaps, k rows to the driver), so the rank window runs over a
    // ≤ topK frame: bounded by construction, not by contract. The old
    // shape (global rank window, then filter rank ≤ k) single-sorted
    // the whole phrase domain — corpus-proportional at 100 TB.
    val wTop = Window.orderBy(col("score").desc, col("phrase").asc)
    scored.orderBy(col("score").desc, col("phrase").asc).limit(topK)
      .withColumn("rank", row_number().over(wTop).cast("long"))
  }

  /** Out-of-vocabulary rate per document against the corpus top-k
    * vocabulary (count desc, term asc — a deterministic cut): the
    * fraction of TOKEN INSTANCES outside the vocab, the standard
    * "how much of this corpus would a fixed tokenizer vocab cover"
    * gate. The vocab is top-k-bounded and broadcast; the token stream
    * is exploded once. Output per doc: (id, n_tokens, n_oov,
    * oov_rate 4dp).
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("w").asc)
      .limit(vocabSize)
      .select(col("w"), lit(1).as("__in"))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 4)
          .as("oov_rate"))
  }

  /** Template mining (X205): the most frequent LINE PATTERNS after
    * masking volatile spans (digit runs → '#', long hex runs → '@') —
    * the log/boilerplate triage that turns a million distinct lines
    * into the dozen templates generating them (the Drain-style first
    * pass, done relationally). One explode at line grain, a narrow
    * masking projection, one pattern-keyed aggregate with map-side
    * partials; topK cut by (count desc, pattern asc). Output:
    * (pattern, n_lines BIGINT, n_docs BIGINT, rank). */
  def templateMiner(df: DataFrame, idCol: String, textCol: String,
                    topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val lines = df.select(col(idCol),
        explode(split(col(textCol), "\n")).as("__line"))
      .filter(length(trim(col("__line"))) > 0)
    val pattern = regexp_replace(
      regexp_replace(col("__line"), "[0-9a-f]{8,}", "@"),
      "[0-9]+", "#")
    val counts = lines
      .select(col(idCol), pattern.as("pattern"))
      .groupBy(col("pattern"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col(idCol)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_lines").desc, col("pattern").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** Mixed-script audit (X191): per document, letter counts by Unicode
    * script (Latin / Cyrillic / Greek) plus digits, and a `mixed` flag
    * when at least two letter scripts co-occur — the homoglyph-spoof /
    * encoding-mojibake screen an LLM-data pipeline runs before
    * language-ID trusts the text (а Cyrillic 'а' inside a Latin word
    * defeats both dedup and langid). Pure regexp_count over script
    * character classes — codegen'd, no UDF, no explode; the regex
    * engines differ in CLASS SYNTAX across engines but agree on class
    * MEMBERSHIP, which is all the counts read. Output: (idCol,
    * n_latin, n_cyrillic, n_greek, n_digit, mixed BOOLEAN). */
  def scriptProfile(df: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val t = col(textCol)
    def c(cls: String) = regexp_count(t, lit(cls))
    df.select(col(idCol),
        c("\\p{IsLatin}").as("n_latin"),
        c("\\p{IsCyrillic}").as("n_cyrillic"),
        c("\\p{IsGreek}").as("n_greek"),
        c("[0-9]").as("n_digit"))
      .withColumn("mixed",
        (when(col("n_latin") > 0, 1).otherwise(0) +
          when(col("n_cyrillic") > 0, 1).otherwise(0) +
          when(col("n_greek") > 0, 1).otherwise(0)) >= 2)
  }
}
