package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.text.UrlOps
import graft.util.Tables
import graft.web.Crawl

/** Oracle-checked catalog entries, round-14 batch: the crawl-lifecycle
  * continuation of the round-13 web-corpus keying layer — cross-
  * snapshot crawl delta (canonical-URL CDC), the measured ANN recall
  * gate (LSH path vs brute force as an oracle row, not a hope), and
  * the per-site politeness/crawl-budget rollup over robots decisions.
  */
object CatalogR14 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val urlRegexSql =
    """^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"""

  // ------------------------------------------------------------------
  // q426: cross-snapshot crawl delta
  // ------------------------------------------------------------------

  /** X338: crawl delta ([[graft.web.Crawl.crawlDelta]] +
    * [[Crawl.deltaByHost]]) — two synthesized crawl snapshots over the
    * documents table (snapshot A drops doc_id%13==5, snapshot B drops
    * %13==0 and rewrites content for %7==1), full-outer CDC on the
    * canonical URL, per-host status counts + integer-exact churn. */
  private val q426 = Q("q426_crawl_delta",
    (s, dir) => {
      import s.implicits._
      val d = $"doc_id"
      val base = t(s, dir, "documents").select(d, $"text",
        concat(lit("https://h"), (d % 23).cast("string"),
          lit(".ex.com/p/"), d.cast("string")).as("url"))
      val snapA = base.filter(d % 13 =!= 5)
        .select($"url", md5($"text").as("h"))
      val snapB = base.filter(d % 13 =!= 0)
        .select($"url",
          when(d % 7 === 1, md5(concat($"text", lit("v2"))))
            .otherwise(md5($"text")).as("h"))
      Crawl.deltaByHost(Crawl.crawlDelta(snapA, snapB, "url", "h"),
          UrlOps.urlHost($"url"))
        .orderBy($"host")
    },
    Some(s"""WITH base AS (
           |  SELECT doc_id, text,
           |    'https://h' || (doc_id%23) || '.ex.com/p/' || doc_id AS url
           |  FROM documents),
           |a AS (SELECT url, md5(text) AS h FROM base WHERE doc_id%13 <> 5),
           |b AS (SELECT url, CASE WHEN doc_id%7 = 1
           |        THEN md5(text || 'v2') ELSE md5(text) END AS h
           |      FROM base WHERE doc_id%13 <> 0),
           |delta AS (
           |  SELECT coalesce(a.url, b.url) AS url,
           |    CASE WHEN a.url IS NULL THEN 'new'
           |         WHEN b.url IS NULL THEN 'gone'
           |         WHEN a.h IS NOT DISTINCT FROM b.h THEN 'unchanged'
           |         ELSE 'changed' END AS status
           |  FROM a FULL JOIN b ON a.url = b.url),
           |hosted AS (
           |  SELECT lower(regexp_replace(regexp_replace(
           |      regexp_extract(url, '$urlRegexSql', 2),
           |      '^[^@]*@', ''), ':[0-9]*$$', '')) AS host, status
           |  FROM delta),
           |agg AS (
           |  SELECT host,
           |    sum(CASE WHEN status='new' THEN 1 ELSE 0 END)::BIGINT AS n_new,
           |    sum(CASE WHEN status='gone' THEN 1 ELSE 0 END)::BIGINT AS n_gone,
           |    sum(CASE WHEN status='changed' THEN 1 ELSE 0 END)::BIGINT
           |      AS n_changed,
           |    sum(CASE WHEN status='unchanged' THEN 1 ELSE 0 END)::BIGINT
           |      AS n_unchanged,
           |    count(*)::BIGINT AS n_urls
           |  FROM hosted GROUP BY host)
           |SELECT host, n_new, n_gone, n_changed, n_unchanged, n_urls,
           |  ((2*(n_new + n_gone + n_changed)*10000 + n_urls)
           |    // (2*n_urls)) / 1e4 AS churn
           |FROM agg ORDER BY host""".stripMargin))

  // ------------------------------------------------------------------
  // q427: ANN recall gate
  // ------------------------------------------------------------------

  /** X339: measured ANN recall ([[graft.ann.Similarity.annRecallAtK]])
    * — recall@5 of the 4×4 multi-table LSH path (q28's exact
    * configuration) against q26's brute-force top-5, per query, as an
    * oracle-checked row. The oracle replays BOTH paths (hyperplane LCG
    * regeneration + candidate join + re-rank, and the exact
    * cross-product top-k) and intersects them — so the shipped recall
    * number is cross-engine-verified, not self-reported. */
  private val q427 = Q("q427_ann_recall",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      graft.ann.Similarity.annRecallAtK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 5, dim = 64, tables = 4,
          planesPerTable = 4)
        .orderBy($"query_id")
    },
    Some("""WITH planes AS (
           |  SELECT p, j, ((1103515245 * ((p * 64 + j) % 2147483648) + 12345) % 2147483648)
           |           / 1073741824.0 - 1.0 AS w
           |  FROM (SELECT unnest(generate_series(0, 15)) AS p),
           |       (SELECT unnest(generate_series(0, 63)) AS j)),
           |ev AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
           |              unnest(embedding::DOUBLE[]) AS x FROM embeddings),
           |dots AS (SELECT vec_id, p, sum(x * w) AS d FROM ev JOIN planes USING (j)
           |         GROUP BY vec_id, p),
           |tb AS (SELECT vec_id, p // 4 AS tbl,
           |         sum(CASE WHEN d > 0 THEN (1 << (p % 4)) ELSE 0 END)::BIGINT AS bucket
           |       FROM dots GROUP BY vec_id, p // 4),
           |qb AS (SELECT * FROM tb WHERE vec_id < 10),
           |cand AS (SELECT DISTINCT qb.vec_id AS query_id, c.vec_id AS neighbor_id
           |         FROM qb JOIN tb c ON qb.tbl = c.tbl AND qb.bucket = c.bucket
           |         WHERE c.vec_id != qb.vec_id),
           |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |cs AS (SELECT query_id, neighbor_id,
           |         list_cosine_similarity(qv.e, cv.e) AS c
           |       FROM cand JOIN v qv ON qv.vec_id = query_id
           |                 JOIN v cv ON cv.vec_id = neighbor_id),
           |ar AS (SELECT *, row_number() OVER (PARTITION BY query_id
           |         ORDER BY c DESC, neighbor_id) AS rank FROM cs),
           |ann AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= 5),
           |vq AS (SELECT * FROM v WHERE vec_id < 10),
           |es AS (SELECT vq.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         list_cosine_similarity(vq.e, c.e) AS cs
           |       FROM vq, v c WHERE c.vec_id != vq.vec_id),
           |er AS (SELECT *, row_number() OVER (PARTITION BY query_id
           |         ORDER BY cs DESC, neighbor_id) AS rank FROM es),
           |ex AS (SELECT query_id, neighbor_id FROM er WHERE rank <= 5),
           |hits AS (SELECT ex.query_id, count(*)::BIGINT AS n_exact,
           |           sum(CASE WHEN ann.neighbor_id IS NOT NULL
           |               THEN 1 ELSE 0 END)::BIGINT AS n_hits
           |         FROM ex LEFT JOIN ann ON ex.query_id = ann.query_id
           |           AND ex.neighbor_id = ann.neighbor_id
           |         GROUP BY ex.query_id),
           |qids AS (SELECT DISTINCT vec_id AS query_id FROM embeddings
           |         WHERE vec_id < 10)
           |SELECT q.query_id,
           |  coalesce(n_exact, 0)::BIGINT AS n_exact,
           |  coalesce(n_hits, 0)::BIGINT AS n_hits,
           |  CASE WHEN coalesce(n_exact, 0) > 0
           |       THEN coalesce(n_hits, 0) / n_exact END AS recall
           |FROM qids q LEFT JOIN hits ON q.query_id = hits.query_id
           |ORDER BY q.query_id""".stripMargin))

  // ------------------------------------------------------------------
  // q428: per-site politeness / crawl-budget rollup
  // ------------------------------------------------------------------

  /** X340: crawl-budget allocation ([[graft.web.Crawl.crawlBudget]])
    * over q424's robots decisions (same generator + rule snapshot):
    * per site — URL/allowed counts, integer-exact allow_rate, and the
    * proportional fair-share fetch budget (floor arithmetic, per-site
    * cap, zero-total guard). */
  private val q428 = Q("q428_crawl_budget",
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
      val decisions = UrlOps.applyPathRules(u, "k", "host", "path", rules)
      Crawl.crawlBudget(decisions, "host", "allowed",
          totalBudget = 10000L, perSiteCap = 2000L)
        .orderBy($"site")
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
           |      AND starts_with(u.path, r.pfx)) WHERE rn = 1),
           |dec AS (SELECT u.k, u.host,
           |          coalesce(best.allow, true) AS allowed
           |        FROM u LEFT JOIN best USING (k)),
           |per AS (SELECT host AS site, count(*)::BIGINT AS n_urls,
           |          sum(CASE WHEN allowed THEN 1 ELSE 0 END)::BIGINT
           |            AS n_allowed
           |        FROM dec GROUP BY host),
           |tot AS (SELECT sum(n_allowed)::BIGINT AS t FROM per)
           |SELECT site, n_urls, n_allowed,
           |  ((2*n_allowed*10000 + n_urls) // (2*n_urls)) / 1e4
           |    AS allow_rate,
           |  (CASE WHEN t > 0
           |    THEN least(2000, (n_allowed * 10000) // nullif(t, 0))
           |    ELSE 0 END)::BIGINT AS budget
           |FROM per, tot ORDER BY site""".stripMargin))

  val all: Seq[Q] = Seq(q426, q427, q428)
}
