package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch W (X146+): snapshot
  * reconciliation, exponential time-decay scoring, and asymmetric
  * containment dedup (excerpt detection).
  */
object CatalogRecon {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X146: snapshot reconciliation ([[graft.util.Reconcile.report]]) —
    * orders vs a deterministically drifted copy (1/97 keys dropped,
    * 1/13 prices bumped a dollar, 1/101 keys cloned right-only); one
    * full-outer join, null-safe per-column mismatch counts. */
  private val q256 = Q("q256_reconcile",
    (s, dir) => {
      import s.implicits._
      val l = t(s, dir, "orders")
      val drift = t(s, dir, "orders")
        .filter($"o_orderkey" % 97 =!= 0)
        .withColumn("o_totalprice",
          when($"o_orderkey" % 13 === 0,
            round($"o_totalprice" + 1.0, 2)).otherwise($"o_totalprice"))
      val extra = t(s, dir, "orders")
        .filter($"o_orderkey" % 101 === 0)
        .withColumn("o_orderkey", $"o_orderkey" + 20000000L)
      graft.util.Reconcile.report(l, drift.unionByName(extra),
        "o_orderkey", Seq("o_totalprice", "o_orderstatus"))
    },
    Some("""WITH r0 AS (
           |  SELECT o_orderkey,
           |    CASE WHEN o_orderkey % 13 = 0
           |         THEN round(o_totalprice + 1.0, 2)
           |         ELSE o_totalprice END AS o_totalprice,
           |    o_orderstatus
           |  FROM orders WHERE o_orderkey % 97 != 0
           |  UNION ALL
           |  SELECT o_orderkey + 20000000, o_totalprice, o_orderstatus
           |  FROM orders WHERE o_orderkey % 101 = 0),
           |j AS (
           |  SELECT l.o_orderkey AS lk, r.o_orderkey AS rk,
           |    l.o_totalprice AS lp, r.o_totalprice AS rp,
           |    l.o_orderstatus AS ls, r.o_orderstatus AS rs
           |  FROM orders l FULL OUTER JOIN r0 r
           |    ON l.o_orderkey = r.o_orderkey)
           |SELECT
           |  sum(CASE WHEN lk IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           |    AS n_left,
           |  sum(CASE WHEN rk IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           |    AS n_right,
           |  sum(CASE WHEN lk IS NOT NULL AND rk IS NULL
           |      THEN 1 ELSE 0 END)::BIGINT AS n_left_only,
           |  sum(CASE WHEN lk IS NULL AND rk IS NOT NULL
           |      THEN 1 ELSE 0 END)::BIGINT AS n_right_only,
           |  sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
           |      THEN 1 ELSE 0 END)::BIGINT AS n_both,
           |  sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
           |       AND (lp IS NOT DISTINCT FROM rp)
           |       AND (ls IS NOT DISTINCT FROM rs)
           |      THEN 1 ELSE 0 END)::BIGINT AS n_matching,
           |  sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
           |       AND NOT ((lp IS NOT DISTINCT FROM rp)
           |                AND (ls IS NOT DISTINCT FROM rs))
           |      THEN 1 ELSE 0 END)::BIGINT AS n_mismatched,
           |  sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
           |       AND NOT (lp IS NOT DISTINCT FROM rp)
           |      THEN 1 ELSE 0 END)::BIGINT AS mismatch_o_totalprice,
           |  sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
           |       AND NOT (ls IS NOT DISTINCT FROM rs)
           |      THEN 1 ELSE 0 END)::BIGINT AS mismatch_o_orderstatus
           |FROM j""".stripMargin))

  /** X147: exponential time-decay engagement score
    * ([[graft.events.TimeWeighted.decayScore]], half-life 7 days,
    * as-of 2024-01-31) per user — the identical ln½ double literal is
    * embedded in the oracle. */
  private val q257 = Q("q257_decay_score",
    (s, dir) => {
      import s.implicits._
      graft.events.TimeWeighted.decayScore(t(s, dir, "events"),
          "user_id", "ts", "value", halfLifeDays = 7.0,
          asOf = "2024-01-31")
        .orderBy($"user_id")
    },
    Some(s"""SELECT user_id, count(*)::BIGINT AS n_events,
           |  round(sum(value * exp(${math.log(0.5)}::DOUBLE
           |    * datediff('day', ts::DATE, DATE '2024-01-31') / 7.0)), 4)
           |    AS decay_score,
           |  max(ts) AS last_ts
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** X148: asymmetric containment pairs
    * ([[graft.dedup.Dedup.containmentPairs]]) — planted excerpts
    * (first 120 chars of every 25th document) must surface with
    * cont ≈ 1 toward their parent; rare-shingle candidate generation
    * (df ≤ 10 — excerpt/parent shingles have df = 2, and the cap is
    * the knob that keeps candidate volume duplicate-proportional),
    * exact relational intersection. */
  private val q258 = Q("q258_containment",
    (s, dir) => {
      import s.implicits._
      val base = t(s, dir, "documents").select($"doc_id", $"text")
      val ex = t(s, dir, "documents").filter($"doc_id" % 25 === 0)
        .select(($"doc_id" + 10000).as("doc_id"),
          substring($"text", 1, 120).as("text"))
      graft.dedup.Dedup.containmentPairs(base.unionByName(ex),
          "doc_id", "text", shingleSize = 3, minContainment = 0.5,
          maxShingleDf = 10L)
        .orderBy($"id_a", $"id_b")
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 10000, substr(text, 1, 120)
           |  FROM documents WHERE doc_id % 25 = 0),
           |toks AS (SELECT doc_id AS id,
           |           regexp_extract_all(text, '\S+') AS tk
           |         FROM corpus),
           |sh AS (
           |  SELECT DISTINCT id,
           |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
           |  FROM (SELECT id, tk,
           |          unnest(generate_series(1, len(tk) - 2)) AS i
           |        FROM toks)),
           |dfq AS (SELECT shingle FROM (
           |    SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
           |  WHERE df <= 10 AND df >= 2),
           |rare AS (SELECT id, sh.shingle FROM sh JOIN dfq USING (shingle)),
           |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |         FROM rare a JOIN rare b
           |           ON a.shingle = b.shingle AND a.id < b.id),
           |sizes AS (SELECT id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
           |common AS (
           |  SELECT id_a, id_b, count(*)::BIGINT AS n_common
           |  FROM cand
           |  JOIN sh sa ON sa.id = id_a
           |  JOIN sh sb ON sb.id = id_b AND sb.shingle = sa.shingle
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b, n_common, na.n AS n_a, nb.n AS n_b,
           |  round(n_common::DOUBLE / na.n, 4) AS cont_a,
           |  round(n_common::DOUBLE / nb.n, 4) AS cont_b
           |FROM common
           |JOIN sizes na ON na.id = id_a
           |JOIN sizes nb ON nb.id = id_b
           |WHERE greatest(round(n_common::DOUBLE / na.n, 4),
           |               round(n_common::DOUBLE / nb.n, 4)) >= 0.5
           |ORDER BY id_a, id_b""".stripMargin))

  val all: Seq[Q] = Seq(q256, q257, q258)
}
