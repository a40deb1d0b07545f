package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BleuCounts, BloomMightContain, CharEntropy, ColumnBridge, CosineSimilarity, DamerauLevenshtein, DictScrub, HypergeomPValue, JaroWinkler, LshTableBuckets, Md5Long, MinhashHashes, NfcNormalize, NormalSF, RegularizedIncBeta, RepetitionCounts, RollingHash64, RougeLCounts, SimHash64, StripAccents, TTestPValue, TextQualityCounts, WordShingles}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** graft's function surface: custom Catalyst expressions exposed as
  * `Column`s plus pure-column helpers composed from Spark built-ins.
  * Everything here is usable inside whole-stage codegen'd plans.
  */
object gfunctions {

  /** Two-sided Student-t p-value P(|T_df| >= |t|) (Welch t-test, A7). */
  def t_test_pvalue(t: Column, df: Column): Column =
    ColumnBridge.column(TTestPValue(
      ColumnBridge.expression(t.cast(DoubleType)),
      ColumnBridge.expression(df.cast(DoubleType))))

  /** Hypergeometric upper-tail p-value P(X >= k): enrichment /
    * over-representation significance of overlap k between a size-n
    * draw and a size-K success set in a size-N population. */
  def hypergeom_pvalue(k: Column, bigK: Column, n: Column,
                       bigN: Column): Column =
    ColumnBridge.column(HypergeomPValue(
      ColumnBridge.expression(k.cast(LongType)),
      ColumnBridge.expression(bigK.cast(LongType)),
      ColumnBridge.expression(n.cast(LongType)),
      ColumnBridge.expression(bigN.cast(LongType))))

  /** Cosine similarity of two ARRAY<DOUBLE> columns (codegen'd). */
  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** 64-bit SimHash of an ARRAY<STRING> token column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** 64-bit string hash (md5 low 8 bytes LE == DuckDB md5_number_lower). */
  def md5_long(c: Column): Column =
    ColumnBridge.column(Md5Long(ColumnBridge.expression(c)))

  /** Order-sensitive 64-bit rolling-hash fingerprint of a token array. */
  def rolling_hash64(tokens: Column): Column =
    ColumnBridge.column(RollingHash64(ColumnBridge.expression(tokens)))

  /** TRUE Damerau-Levenshtein distance (DuckDB damerau_levenshtein
    * semantics — unrestricted transpositions, codegen'd). */
  def damerau_levenshtein(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Jaro-Winkler similarity (DuckDB jaro_winkler_similarity semantics). */
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Word n-gram shingles of a STRING column, native + codegen'd (the
    * dedup hot path; same token boundaries as TextAnalysis.shingles). */
  def word_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Unicode NFC normalization (UAX #15) of a STRING column, native +
    * codegen'd — canonical forms match DuckDB `nfc_normalize`. */
  def nfc_normalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  /** Diacritic stripping (DuckDB strip_accents semantics — NFD, drop
    * combining marks, NFC), native + codegen'd. */
  def strip_accents(text: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(text)))

  /** Aho–Corasick dictionary scrub of a STRING column: every
    * non-overlapping leftmost-longest dictionary-term occurrence →
    * `mask`, one codegen'd automaton pass — O(bytes + matches)
    * regardless of dictionary size (the 10k-term gazetteer scrub the
    * regex-alternation route can't reach). */
  def dict_scrub(text: Column, dict: Seq[String],
                 mask: String = "[MASK]"): Column =
    ColumnBridge.column(DictScrub(ColumnBridge.expression(text), dict, mask))

  /** Shannon entropy (bits) of a STRING column's code-point
    * distribution, native + codegen'd — the base64/padding screen. */
  def char_entropy(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))

  /** BLEU clipped-match sufficient statistics of a (candidate,
    * reference) pair, native + codegen'd:
    * [num1, den1, ..., num4, den4, cand_len, ref_len]. */
  def bleu_counts(cand: Column, ref: Column): Column =
    ColumnBridge.column(BleuCounts(ColumnBridge.expression(cand),
      ColumnBridge.expression(ref)))

  /** ROUGE-L sufficient statistics of a (candidate, reference) pair,
    * native + codegen'd: [lcs_len, cand_len, ref_len]. */
  def rouge_l_counts(cand: Column, ref: Column): Column =
    ColumnBridge.column(RougeLCounts(ColumnBridge.expression(cand),
      ColumnBridge.expression(ref)))

  /** Repetition counts of a STRING column in one native pass:
    * [total n-grams, distinct n-grams, n_tokens, max token count]. */
  def repetition_counts(text: Column, n: Int): Column =
    ColumnBridge.column(RepetitionCounts(ColumnBridge.expression(text), n))

  /** Quality-metric counts of a STRING column in one native pass:
    * [n_tokens, n_non_ws, n_alpha, n_digit, n_marker_tokens]. */
  def text_quality_counts(text: Column, markers: Seq[String]): Column =
    ColumnBridge.column(TextQualityCounts(
      ColumnBridge.expression(text), markers))

  /** The k MinHash hash-family values of a shingle STRING column
    * (== md5_long("i:" + shingle) for each i), one codegen call. */
  def minhash_hashes(shingle: Column, k: Int): Column =
    ColumnBridge.column(MinhashHashes(ColumnBridge.expression(shingle), k))

  /** Per-table LSH buckets of an ARRAY<DOUBLE> column (deterministic LCG
    * hyperplanes, one kernel call per row). */
  def lsh_table_buckets(vec: Column, tables: Int, planesPerTable: Int,
                        dim: Int): Column =
    ColumnBridge.column(LshTableBuckets(
      ColumnBridge.expression(vec), tables, planesPerTable, dim))

  /** Bloom-filter membership probe of a STRING column against a
    * serialized sketch BloomFilter literal (codegen'd; no false
    * negatives, build-time fpp on positives). */
  def bloom_might_contain(bloomBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(lit(bloomBytes)),
      ColumnBridge.expression(value)))

  /** Great-circle (haversine) distance in km between two lat/lon
    * degree pairs — pure built-ins, codegen'd; the identical
    * expression tree is replayable in any SQL engine (libm last-ulp
    * differences are absorbed by the caller's rounding contract).
    * Mean Earth radius 6371.0 km. */
  def haversine_km(lat1: Column, lon1: Column, lat2: Column,
                   lon2: Column): Column = {
    val dlat = radians(lat2 - lat1) / 2
    val dlon = radians(lon2 - lon1) / 2
    val a = sin(dlat) * sin(dlat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dlon) * sin(dlon)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** NaN / +-Inf -> null (F4, `pipeline2.py:617` inf coercion plus graft's
    * NaN-as-null discipline, SURVEY §1.2). */
  def nan_inf_to_null(c: Column): Column =
    when(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity,
      lit(null).cast(DoubleType)).otherwise(c)

  /** Welch t-statistic from per-group sufficient statistics
    * (t = (meanA - meanB) / sqrt(varA/nA + varB/nB); A = case, B = control
    * to match `scipy.stats.ttest_ind(case, control)`). Division by a zero
    * standard error yields null (scipy yields NaN; normalized to null). */
  def welch_t(meanA: Column, varA: Column, nA: Column,
              meanB: Column, varB: Column, nB: Column): Column = {
    val se = sqrt(varA / nA + varB / nB)
    (meanA - meanB) / nullif(se, lit(0.0))
  }

  /** Welch–Satterthwaite degrees of freedom. Null when either group has
    * fewer than 2 observations (sample variance undefined). The nullif
    * guards keep this ANSI-safe: division by zero yields null, never an
    * error, matching scipy's NaN-on-degenerate-input. */
  def welch_df(varA: Column, nA: Column, varB: Column, nB: Column): Column = {
    val a = varA / nA
    val b = varB / nB
    val num = (a + b) * (a + b)
    val den = (a * a) / nullif(nA - lit(1), lit(0)) +
      (b * b) / nullif(nB - lit(1), lit(0))
    num / nullif(den, lit(0.0))
  }

  /** Gene-symbol validity predicate (F6, `pipeline2.py:794-827`): length
    * 1..20, no "_at", no UNKNOWN_ prefix, at least one letter, charset
    * alnum plus '.' and '-'. Pure built-ins, no UDF. */
  def is_valid_symbol(c: Column): Column =
    c.isNotNull &&
      length(c).between(1, 20) &&
      !lower(c).contains("_at") &&
      !c.startsWith("UNKNOWN_") &&
      c.rlike("[A-Za-z]") &&
      c.rlike("^[A-Za-z0-9.\\-]+$")

  /** Regularized incomplete beta I_x(a, b): F-distribution tails
    * (P(F_{d1,d2} > f) = reg_inc_beta(d2/(d2+d1*f), d2/2, d1/2)),
    * binomial tails, t tails. */
  def reg_inc_beta(x: Column, a: Column, b: Column): Column =
    ColumnBridge.column(RegularizedIncBeta(
      ColumnBridge.expression(x.cast(DoubleType)),
      ColumnBridge.expression(a.cast(DoubleType)),
      ColumnBridge.expression(b.cast(DoubleType))))

  /** Standard-normal survival function P(Z > z) (rank-test and
    * two-proportion normal approximations). */
  def normal_sf(z: Column): Column =
    ColumnBridge.column(NormalSF(
      ColumnBridge.expression(z.cast(DoubleType))))

  /** Register the SQL-callable names (usable from `spark.sql`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "t_test_pvalue", exprs => TTestPValue(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "md5_long", exprs => Md5Long(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "char_entropy", exprs => CharEntropy(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "bleu_counts", exprs => BleuCounts(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "rouge_l_counts", exprs => RougeLCounts(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "strip_accents", exprs => StripAccents(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "damerau_levenshtein",
      exprs => DamerauLevenshtein(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "reg_inc_beta",
      exprs => RegularizedIncBeta(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "normal_sf", exprs => NormalSF(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "hypergeom_pvalue",
      exprs => HypergeomPValue(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
  }
}
