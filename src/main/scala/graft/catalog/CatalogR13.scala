package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.dedup.Dedup
import graft.functions.gfunctions._
import graft.text.UrlOps
import graft.util.Tables

/** Oracle-checked catalog entries, round-13 batch: the web-corpus
  * keying pair (URL canonicalization + registrable-domain / eTLD+1
  * against a snapshot public-suffix table), the gazetteer-scale
  * dictionary scrub (Aho–Corasick, codegen'd), and paragraph-grain
  * corpus dedup (the Dolma companion to q63's line grain).
  */
object CatalogR13 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------------------------
  // q421: URL canonicalization + eTLD+1 rollup
  // ------------------------------------------------------------------

  /** Pinned public-suffix snapshot (a subset of the publicsuffix.org
    * list — multi-label and private-registry entries included so the
    * longest-suffix rule is actually exercised; production swaps in
    * the full ~10k-row snapshot, same broadcast join). */
  private val suffixList: Seq[String] = Seq(
    "com", "org", "net", "io", "dev", "app", "ai", "co",
    "uk", "co.uk", "org.uk", "ac.uk",
    "au", "com.au", "org.au",
    "jp", "co.jp", "ne.jp",
    "de", "fr", "br", "com.br",
    "in", "co.in", "cn", "com.cn",
    "github.io")

  private val urlRegexSql =
    """^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"""

  /** X329: URL canonicalization + registrable-domain rollup
    * ([[graft.text.UrlOps]]) — synthesized crawl URLs over every
    * suffix in the snapshot (schemes/hosts in mixed case, default and
    * non-default ports, utm tracking params, trailing slashes,
    * fragments, plus malformed rows) canonicalize, resolve to eTLD+1
    * via the longest-suffix broadcast join, and roll up per
    * registrable domain. */
  private val q421 = Q("q421_url_canon",
    (s, dir) => {
      import s.implicits._
      val suffixes = suffixList.zipWithIndex
        .map { case (suf, i) => (i.toLong, suf) }.toDF("idx", "suffix")
      val k = $"k"
      val urls = t(s, dir, "customer").select($"c_custkey".as("k"))
        .join(broadcast(suffixes), ($"k" % 27) === $"idx")
        .select(k, when(k % 11 === 0,
          concat(lit("not a url "), k.cast("string")))
          .otherwise(concat(
            when(k % 4 === 0, "HTTPS").when(k % 4 === 1, "http")
              .when(k % 4 === 2, "https").otherwise("HTTP"),
            lit("://"),
            when(k % 3 === 0, "WWW.").when(k % 3 === 1, "shop.")
              .otherwise(""),
            lit("brand"), (k % 40).cast("string"), lit("."), $"suffix",
            when(k % 5 === 0, ":443").when(k % 5 === 1, ":80")
              .when(k % 5 === 2, ":8080").otherwise(""),
            when(k % 6 === 0, lit("")).when(k % 6 === 1, lit("/"))
              .when(k % 6 === 2, concat(lit("/p/"), k.cast("string")))
              .when(k % 6 === 3, concat(lit("/p/"), k.cast("string"), lit("/")))
              .otherwise(lit("/cat/x")),
            when(k % 7 === 0, lit("?utm_source=mail"))
              .when(k % 7 === 1,
                concat(lit("?id="), (k % 9).cast("string"),
                  lit("&utm_campaign=x")))
              .when(k % 7 === 2,
                concat(lit("?utm_medium=a&id="), (k % 9).cast("string")))
              .when(k % 7 === 3, lit("?a=1&b=2"))
              .otherwise(lit("")),
            when(k % 8 === 0, "#sec2").otherwise("")))
          .as("url"))
      val canon = urls.select(k,
        UrlOps.canonicalizeUrl($"url").as("canon"),
        UrlOps.urlHost($"url").as("host"))
      UrlOps.registrableDomain(canon, "host", suffixes.select("suffix"))
        .groupBy(coalesce($"etld1", lit("(none)")).as("etld1"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct($"host").as("n_hosts"),
          countDistinct($"canon").as("n_canon"),
          min($"canon").as("min_canon"))
        .orderBy($"etld1")
    },
    Some(s"""WITH suf(idx, suffix) AS (VALUES
           |  ${suffixList.zipWithIndex
               .map { case (suf, i) => s"($i,'$suf')" }.mkString(",")}),
           |urls AS (
           |  SELECT c_custkey AS k, CASE WHEN c_custkey % 11 = 0
           |    THEN 'not a url ' || c_custkey ELSE
           |    (CASE c_custkey%4 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http'
           |      WHEN 2 THEN 'https' ELSE 'HTTP' END) || '://' ||
           |    (CASE c_custkey%3 WHEN 0 THEN 'WWW.' WHEN 1 THEN 'shop.'
           |      ELSE '' END) ||
           |    'brand' || (c_custkey%40) || '.' || s.suffix ||
           |    (CASE c_custkey%5 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
           |      WHEN 2 THEN ':8080' ELSE '' END) ||
           |    (CASE c_custkey%6 WHEN 0 THEN '' WHEN 1 THEN '/'
           |      WHEN 2 THEN '/p/'||c_custkey
           |      WHEN 3 THEN '/p/'||c_custkey||'/' ELSE '/cat/x' END) ||
           |    (CASE c_custkey%7 WHEN 0 THEN '?utm_source=mail'
           |      WHEN 1 THEN '?id='||(c_custkey%9)||'&utm_campaign=x'
           |      WHEN 2 THEN '?utm_medium=a&id='||(c_custkey%9)
           |      WHEN 3 THEN '?a=1&b=2' ELSE '' END) ||
           |    (CASE WHEN c_custkey%8=0 THEN '#sec2' ELSE '' END) END AS url
           |  FROM customer JOIN suf s ON (c_custkey % 27) = s.idx),
           |parts AS (SELECT k, url,
           |    regexp_extract(url, '$urlRegexSql', 1) AS sch_raw,
           |    regexp_extract(url, '$urlRegexSql', 2) AS auth,
           |    regexp_extract(url, '$urlRegexSql', 3) AS rawpath,
           |    regexp_extract(url, '$urlRegexSql', 4) AS rawq
           |  FROM urls),
           |parts2 AS (SELECT *, lower(sch_raw) AS scheme,
           |    CASE WHEN sch_raw = '' THEN NULL ELSE
           |      lower(regexp_replace(regexp_replace(auth, '^[^@]*@', ''),
           |        ':[0-9]*$$', '')) END AS host,
           |    regexp_extract(auth, ':([0-9]+)$$', 1) AS port,
           |    array_to_string(list_filter(string_split(rawq, '&'),
           |      x -> NOT starts_with(x, 'utm_') AND x <> ''), '&') AS q
           |  FROM parts),
           |canon0 AS (SELECT k, host, CASE WHEN sch_raw = '' THEN NULL ELSE
           |    scheme || '://' || host ||
           |    (CASE WHEN port <> ''
           |      AND NOT (scheme='http' AND nullif(port,'')::INT = 80)
           |      AND NOT (scheme='https' AND nullif(port,'')::INT = 443)
           |      THEN ':'||(nullif(port,'')::INT)::VARCHAR ELSE '' END) ||
           |    (CASE WHEN rawpath IN ('','/') THEN '/'
           |      ELSE regexp_replace(rawpath, '/$$', '') END) ||
           |    (CASE WHEN q <> '' THEN '?' || q ELSE '' END) END AS canon
           |  FROM parts2),
           |lab AS (SELECT host, string_split(host,'.') AS ls,
           |    len(string_split(host,'.')) AS n
           |  FROM (SELECT DISTINCT host FROM canon0 WHERE host IS NOT NULL)),
           |m AS (SELECT host, max(slen) AS l FROM (
           |    SELECT host, array_to_string(ls[i:n],'.') AS c, n-i+1 AS slen
           |    FROM (SELECT host, ls, n,
           |            unnest(generate_series(1, n)) AS i FROM lab))
           |  JOIN suf ON c = suf.suffix GROUP BY host),
           |res AS (SELECT lab.host,
           |    CASE WHEN m.l IS NOT NULL AND lab.n > m.l
           |           THEN array_to_string(ls[lab.n-m.l:lab.n], '.')
           |         WHEN m.l IS NULL AND lab.n >= 2
           |           THEN array_to_string(ls[lab.n-1:lab.n], '.')
           |         ELSE NULL END AS etld1
           |  FROM lab LEFT JOIN m ON lab.host = m.host)
           |SELECT coalesce(etld1, '(none)') AS etld1,
           |  count(*)::BIGINT AS n_urls,
           |  count(DISTINCT c0.host)::BIGINT AS n_hosts,
           |  count(DISTINCT canon)::BIGINT AS n_canon,
           |  min(canon) AS min_canon
           |FROM canon0 c0 LEFT JOIN res ON c0.host = res.host
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ------------------------------------------------------------------
  // q422: Aho–Corasick dictionary scrub
  // ------------------------------------------------------------------

  /** Pinned gazetteer, LONGEST-FIRST (the order the oracle's regex
    * alternation needs for leftmost-longest parity; the AC automaton
    * is order-insensitive). Nested terms — "scan" inside "row scan",
    * "merge" inside "fast merge" — exercise the dict-link chain. */
  private val scrubDict: Seq[String] = Seq(
    "value table part", "customer query", "value table", "slow filter",
    "table part", "fast merge", "hash join", "row scan",
    "window", "spark", "batch", "query", "merge", "scan")

  /** X330: gazetteer dictionary scrub ([[graft.functions.gfunctions
    * .dict_scrub]], the Aho–Corasick expression) — every
    * leftmost-longest dictionary hit in the document text masked in one
    * codegen'd automaton pass; per-doc digest + mask count. The oracle
    * replays the pinned semantics as a longest-first regex
    * alternation. */
  private val q422 = Q("q422_dict_scrub",
    (s, dir) => {
      import s.implicits._
      val scrub = dict_scrub($"text", scrubDict, "[MASK]")
      t(s, dir, "documents")
        .select($"doc_id", scrub.as("__s"))
        .select($"doc_id", md5($"__s").as("scrub_md5"),
          ((length($"__s") -
            length(regexp_replace($"__s", "\\[MASK\\]", ""))) / 6)
            .cast("long").as("n_mask"),
          length($"__s").cast("long").as("n_chars"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH scrub AS (SELECT doc_id,
           |    regexp_replace(text,
           |      '(${scrubDict.mkString("|")})', '[MASK]', 'g') AS s
           |  FROM documents)
           |SELECT doc_id, md5(s) AS scrub_md5,
           |  ((length(s) - length(replace(s, '[MASK]', ''))) // 6)::BIGINT
           |    AS n_mask,
           |  length(s)::BIGINT AS n_chars
           |FROM scrub ORDER BY doc_id""".stripMargin))

  // ------------------------------------------------------------------
  // q423: paragraph-grain corpus dedup
  // ------------------------------------------------------------------

  private val corpusSql =
    """corpus AS (
      |  SELECT doc_id AS id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL SELECT doc_id + 2000000, text || ' extra' FROM documents WHERE doc_id % 5 = 0)""".stripMargin

  /** X331: paragraph-grain cross-corpus dedup
    * ([[graft.dedup.Dedup.paragraphDedup]], the Dolma companion to
    * q63's line grain) over the dup-seeded corpus re-paragraphed into
    * 8-token paragraphs; every third doc joins paragraphs with a
    * TRIPLE newline so the operator's `\n{2,}` boundary collapse is
    * exercised, and reassembly canonicalizes spacing to one blank
    * line. The oracle replays paragraph units directly (separator
    * width never changes the unit). */
  private val q423 = Q("q423_paragraph_dedup",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val corpus = docs.select($"doc_id".as("id"), $"text")
        .union(docs.filter($"doc_id" % 7 === 0)
          .select(($"doc_id" + 1000000).as("id"), $"text"))
        .union(docs.filter($"doc_id" % 5 === 0)
          .select(($"doc_id" + 2000000).as("id"),
            concat($"text", lit(" extra")).as("text")))
      val toks = split(regexp_replace($"text", "[\r\n]", " "), " ")
      val joined = array_join(
        transform(
          sequence(lit(0), floor((size(toks) - 1) / 8).cast("int")),
          i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")),
        "\n\n")
      val parad = corpus.select($"id",
        when($"id" % 3 === 0,
          regexp_replace(joined, "\n\n", "\n\n\n"))
          .otherwise(joined).as("text"))
      Dedup.paragraphDedup(parad, "id", "text")
        .select($"id", md5($"text").as("text_md5"),
          length($"text").cast("long").as("n_chars"))
        .orderBy($"id")
    },
    Some(s"""WITH $corpusSql,
           |toks AS (SELECT id,
           |           string_split(regexp_replace(text, '[\r\n]', ' ', 'g'),
           |                        ' ') AS tk
           |         FROM corpus),
           |paras AS (SELECT id, i AS pos,
           |            array_to_string(tk[i*8+1:i*8+8], ' ') AS para
           |          FROM (SELECT id, tk,
           |                  unnest(generate_series(0,
           |                    CAST(floor((len(tk)-1)/8.0) AS INT))) AS i
           |                FROM toks)),
           |ranked AS (SELECT *, row_number()
           |             OVER (PARTITION BY para ORDER BY id, pos) AS rn
           |           FROM paras),
           |rebuilt AS (SELECT id,
           |              string_agg(para, chr(10)||chr(10) ORDER BY pos)
           |                AS text
           |            FROM ranked WHERE rn = 1 GROUP BY id)
           |SELECT c.id, md5(coalesce(r.text, '')) AS text_md5,
           |       length(coalesce(r.text, ''))::BIGINT AS n_chars
           |FROM corpus c LEFT JOIN rebuilt r ON c.id = r.id
           |ORDER BY c.id""".stripMargin))

  // ------------------------------------------------------------------
  // q424: robots-style longest-prefix path rules
  // ------------------------------------------------------------------

  /** X332: crawl path filtering ([[graft.text.UrlOps.applyPathRules]])
    * — synthesized (host, path) rows against a pinned rule snapshot
    * exercising longest-prefix override (/admin/public beats /admin/),
    * the equal-length ALLOW-wins tie (/dup appears with both verdicts),
    * and the no-rule default. */
  private val q424 = Q("q424_robots_rules",
    (s, dir) => {
      import s.implicits._
      val k = $"k"
      val u = t(s, dir, "customer").select($"c_custkey".as("k"))
        .select(k,
          concat(lit("site"), (k % 7).cast("string"), lit(".com"))
            .as("host"),
          when(k % 5 === 0,
            concat(lit("/admin/public/page"), (k % 3).cast("string")))
            .when(k % 5 === 1, lit("/admin/secret"))
            .when(k % 5 === 2, concat(lit("/p/"), (k % 30).cast("string")))
            .when(k % 5 === 3, lit("/dup"))
            .otherwise(lit("/")).as("path"))
      val rules = (0 until 7).flatMap { i =>
        Seq((s"site$i.com", "/admin/", false),
          (s"site$i.com", "/admin/public", true),
          (s"site$i.com", "/dup", true),
          (s"site$i.com", "/dup", false),
          (s"site$i.com", "/tmp", false))
      }.toDF("host", "path_prefix", "allow")
      UrlOps.applyPathRules(u, "k", "host", "path", rules)
        .orderBy($"k")
    },
    Some(s"""WITH u AS (
           |  SELECT c_custkey AS k,
           |    'site' || (c_custkey%7) || '.com' AS host,
           |    CASE c_custkey%5
           |      WHEN 0 THEN '/admin/public/page' || (c_custkey%3)
           |      WHEN 1 THEN '/admin/secret'
           |      WHEN 2 THEN '/p/' || (c_custkey%30)
           |      WHEN 3 THEN '/dup' ELSE '/' END AS path
           |  FROM customer),
           |r(host, pfx, allow) AS (VALUES
           |  ${(0 until 7).flatMap(i => Seq(
               s"('site$i.com','/admin/',false)",
               s"('site$i.com','/admin/public',true)",
               s"('site$i.com','/dup',true)",
               s"('site$i.com','/dup',false)",
               s"('site$i.com','/tmp',false)")).mkString(",")}),
           |best AS (SELECT k, allow FROM (
           |    SELECT u.k, r.allow, row_number() OVER (PARTITION BY u.k
           |      ORDER BY length(r.pfx) DESC, r.allow DESC) AS rn
           |    FROM u JOIN r ON u.host = r.host
           |      AND starts_with(u.path, r.pfx)) WHERE rn = 1)
           |SELECT u.k, u.host, u.path,
           |  coalesce(best.allow, true) AS allowed
           |FROM u LEFT JOIN best USING (k) ORDER BY u.k""".stripMargin))

  // ------------------------------------------------------------------
  // q425: canonical-URL dedup
  // ------------------------------------------------------------------

  /** X333: canonical-URL dedup — per-doc URL variants (mixed case +
    * default port, trailing slash, utm params, a REAL distinguishing
    * param) collapse under [[UrlOps.canonicalizeUrl]] to the crawl's
    * true page identity; dedup keeps (min doc_id) per canonical URL.
    * The variant classes are constructed so canonicalization MERGES
    * three of the four shapes and keeps `?id=1` distinct. */
  private val q425 = Q("q425_url_dedup",
    (s, dir) => {
      import s.implicits._
      val d = $"doc_id"
      val urls = t(s, dir, "documents").select(d,
        when(d % 4 === 0, concat(lit("https://www.ex"),
          (d % 40).cast("string"), lit(".com/p/"), (d % 25).cast("string")))
          .when(d % 4 === 1, concat(lit("HTTPS://WWW.EX"),
            (d % 40).cast("string"),
            lit(".COM:443/p/"), (d % 25).cast("string"),
            lit("?utm_source=x")))
          .when(d % 4 === 2, concat(lit("https://www.ex"),
            (d % 40).cast("string"), lit(".com/p/"), (d % 25).cast("string"),
            lit("/")))
          .otherwise(concat(lit("https://www.ex"),
            (d % 40).cast("string"), lit(".com/p/"), (d % 25).cast("string"),
            lit("?id=1"))).as("url"))
      urls.select(d, UrlOps.canonicalizeUrl($"url").as("canon"))
        .groupBy($"canon")
        .agg(min(d).as("keep_id"), count(lit(1)).as("n_docs"))
        .orderBy($"canon")
    },
    Some(s"""WITH urls AS (
           |  SELECT doc_id,
           |    CASE doc_id%4
           |      WHEN 0 THEN 'https://www.ex' || (doc_id%40) ||
           |        '.com/p/' || (doc_id%25)
           |      WHEN 1 THEN 'HTTPS://WWW.EX' || (doc_id%40) ||
           |        '.COM:443/p/' || (doc_id%25) || '?utm_source=x'
           |      WHEN 2 THEN 'https://www.ex' || (doc_id%40) ||
           |        '.com/p/' || (doc_id%25) || '/'
           |      ELSE 'https://www.ex' || (doc_id%40) ||
           |        '.com/p/' || (doc_id%25) || '?id=1' END AS url
           |  FROM documents),
           |parts AS (SELECT doc_id, url,
           |    regexp_extract(url, '$urlRegexSql', 1) AS sch_raw,
           |    regexp_extract(url, '$urlRegexSql', 2) AS auth,
           |    regexp_extract(url, '$urlRegexSql', 3) AS rawpath,
           |    regexp_extract(url, '$urlRegexSql', 4) AS rawq
           |  FROM urls),
           |parts2 AS (SELECT *, lower(sch_raw) AS scheme,
           |    lower(regexp_replace(regexp_replace(auth, '^[^@]*@', ''),
           |      ':[0-9]*$$', '')) AS host,
           |    regexp_extract(auth, ':([0-9]+)$$', 1) AS port,
           |    array_to_string(list_filter(string_split(rawq, '&'),
           |      x -> NOT starts_with(x, 'utm_') AND x <> ''), '&') AS q
           |  FROM parts),
           |canon0 AS (SELECT doc_id, CASE WHEN sch_raw = '' THEN NULL ELSE
           |    scheme || '://' || host ||
           |    (CASE WHEN port <> ''
           |      AND NOT (scheme='http' AND nullif(port,'')::INT = 80)
           |      AND NOT (scheme='https' AND nullif(port,'')::INT = 443)
           |      THEN ':'||(nullif(port,'')::INT)::VARCHAR ELSE '' END) ||
           |    (CASE WHEN rawpath IN ('','/') THEN '/'
           |      ELSE regexp_replace(rawpath, '/$$', '') END) ||
           |    (CASE WHEN q <> '' THEN '?' || q ELSE '' END) END AS canon
           |  FROM parts2)
           |SELECT canon, min(doc_id) AS keep_id,
           |  count(*)::BIGINT AS n_docs
           |FROM canon0 GROUP BY canon ORDER BY canon""".stripMargin))

  val all: Seq[Q] = Seq(q421, q422, q423, q424, q425)
}
