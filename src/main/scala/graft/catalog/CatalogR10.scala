package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-10 batch: source-level data
  * valuation (leave-one-out OLS influence via additive sufficient
  * statistics) and verbatim-overlap span localization (contamination
  * at span grain). Both are training-data-pipeline operators first:
  * "which slice of my mix moves the model" and "where exactly did the
  * benchmark leak in, and how long is the copy".
  */
object CatalogR10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X: per-source leave-one-out OLS influence
    * ([[graft.ml.Influence.looSourceOls2]]): cents ~ hour + ISO dow per
    * event_type slice, every LOO model from ONE aggregate pass
    * (sufficient statistics are additive; the subtraction replaces
    * |sources| refit jobs). Integer-valued y/x1/x2 keep the sums — and
    * therefore the closed-form solve — bit-identical across engines. */
  private val q402 = Q("q402_loo_influence",
    (s, dir) => {
      import s.implicits._
      graft.ml.Influence.looSourceOls2(
        t(s, dir, "events").select($"event_type",
          round($"value" * 100).as("y"),
          hour($"ts").as("x1"),
          (pmod(dayofweek($"ts") + 5, lit(7)) + 1).as("x2")),
        "event_type", "y", "x1", "x2")
        .orderBy($"source")
    },
    Some("""WITH e AS (
           |  -- complete-case mirrors the operator (fuzz-21: the q224
           |  -- class — count(*) counted null-y rows the sums skipped)
           |  SELECT event_type AS src, round(value * 100) AS y,
           |         hour(ts)::DOUBLE AS x1, isodow(ts)::DOUBLE AS x2
           |  FROM events
           |  WHERE value IS NOT NULL AND ts IS NOT NULL),
           |g AS (
           |  SELECT src, count(*)::DOUBLE AS n, sum(x1) AS s1,
           |    sum(x2) AS s2, sum(y) AS sy, sum(x1 * x1) AS s11,
           |    sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
           |    sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
           |    sum(y * y) AS syy
           |  FROM e GROUP BY 1),
           |tt AS (
           |  SELECT count(*)::DOUBLE AS n, sum(x1) AS s1, sum(x2) AS s2,
           |    sum(y) AS sy, sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
           |    sum(x1 * x2) AS s12, sum(x1 * y) AS s1y,
           |    sum(x2 * y) AS s2y, sum(y * y) AS syy
           |  FROM e),
           |f AS (
           |  SELECT g.src, g.n AS gn,
           |    -- full fit on the totals (q224 expression order)
           |    tt.s11 - tt.s1 * tt.s1 / tt.n AS fc11,
           |    tt.s22 - tt.s2 * tt.s2 / tt.n AS fc22,
           |    tt.s12 - tt.s1 * tt.s2 / tt.n AS fc12,
           |    tt.s1y - tt.s1 * tt.sy / tt.n AS fc1y,
           |    tt.s2y - tt.s2 * tt.sy / tt.n AS fc2y,
           |    tt.syy - tt.sy * tt.sy / tt.n AS fcyy,
           |    -- LOO fit on (totals - source), same expression order
           |    (tt.s11 - g.s11) - (tt.s1 - g.s1) * (tt.s1 - g.s1)
           |      / (tt.n - g.n) AS lc11,
           |    (tt.s22 - g.s22) - (tt.s2 - g.s2) * (tt.s2 - g.s2)
           |      / (tt.n - g.n) AS lc22,
           |    (tt.s12 - g.s12) - (tt.s1 - g.s1) * (tt.s2 - g.s2)
           |      / (tt.n - g.n) AS lc12,
           |    (tt.s1y - g.s1y) - (tt.s1 - g.s1) * (tt.sy - g.sy)
           |      / (tt.n - g.n) AS lc1y,
           |    (tt.s2y - g.s2y) - (tt.s2 - g.s2) * (tt.sy - g.sy)
           |      / (tt.n - g.n) AS lc2y,
           |    (tt.syy - g.syy) - (tt.sy - g.sy) * (tt.sy - g.sy)
           |      / (tt.n - g.n) AS lcyy
           |  FROM g CROSS JOIN tt),
           |b AS (
           |  SELECT src, gn,
           |    CASE WHEN fc11 * fc22 - fc12 * fc12 <> 0 THEN
           |      (fc1y * fc22 - fc2y * fc12) / (fc11 * fc22 - fc12 * fc12)
           |    END AS fb1,
           |    CASE WHEN fc11 * fc22 - fc12 * fc12 <> 0 THEN
           |      (fc2y * fc11 - fc1y * fc12) / (fc11 * fc22 - fc12 * fc12)
           |    END AS fb2,
           |    fc1y, fc2y, fcyy,
           |    CASE WHEN lc11 * lc22 - lc12 * lc12 <> 0 THEN
           |      (lc1y * lc22 - lc2y * lc12) / (lc11 * lc22 - lc12 * lc12)
           |    END AS lb1,
           |    CASE WHEN lc11 * lc22 - lc12 * lc12 <> 0 THEN
           |      (lc2y * lc11 - lc1y * lc12) / (lc11 * lc22 - lc12 * lc12)
           |    END AS lb2,
           |    lc1y, lc2y, lcyy
           |  FROM f),
           |r AS (
           |  SELECT src, gn, fb1, lb1,
           |    CASE WHEN fcyy <> 0 THEN (fb1 * fc1y + fb2 * fc2y) / fcyy
           |      END AS fr2,
           |    CASE WHEN lcyy <> 0 THEN (lb1 * lc1y + lb2 * lc2y) / lcyy
           |      END AS lr2
           |  FROM b)
           |SELECT src AS source, gn::BIGINT AS n_source,
           |  round(fb1, 4) AS b1_full, round(lb1, 4) AS b1_loo,
           |  round(lb1 - fb1, 4) AS b1_delta,
           |  round(fr2, 4) AS r2_full, round(lr2, 4) AS r2_loo,
           |  round(lr2 - fr2, 4) AS r2_delta
           |FROM r ORDER BY source""".stripMargin))

  /** X: verbatim-overlap spans vs the doc_id < 25 eval slice
    * ([[graft.text.Overlap.verbatimSpans]]): 8-token anchors, df-capped
    * corpus side, diagonal gaps-and-islands — the longest verbatim run
    * per (corpus doc, eval doc), self-pairs excluded. */
  private val q403 = Q("q403_eval_spans",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      graft.text.Overlap.verbatimSpans(
          docs, "doc_id", "text",
          docs.filter($"doc_id" < 25)
            .select($"doc_id".as("eval_id"), $"text"),
          "eval_id", "text", k = 8, maxAnchorDf = 20L)
        .filter($"corpus_id" =!= $"eval_id")
        .orderBy($"corpus_id", $"eval_id")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
           |  FROM documents),
           |a AS (
           |  SELECT doc_id, u.i AS pos,
           |         array_to_string(ts[u.i:u.i + 7], ' ') AS anch
           |  FROM tok,
           |    LATERAL unnest(range(1, greatest(len(ts) - 6, 1))) u(i)),
           |rare AS (
           |  SELECT * FROM (
           |    SELECT doc_id, pos, anch,
           |           count(*) OVER (PARTITION BY anch) AS df
           |    FROM a) WHERE df <= 20),
           |ea AS (
           |  SELECT doc_id AS eval_id, pos AS e_pos, anch
           |  FROM a WHERE doc_id < 25),
           |hits AS (
           |  SELECT rare.doc_id AS corpus_id, ea.eval_id,
           |         rare.pos AS c_pos, ea.e_pos,
           |         rare.pos - ea.e_pos AS d
           |  FROM rare JOIN ea USING (anch)),
           |isl AS (
           |  SELECT corpus_id, eval_id, d, e_pos,
           |    e_pos - row_number() OVER (
           |      PARTITION BY corpus_id, eval_id, d ORDER BY e_pos)
           |      AS grp
           |  FROM hits),
           |runs AS (
           |  SELECT corpus_id, eval_id, d, grp, count(*) AS run
           |  FROM isl GROUP BY ALL)
           |SELECT corpus_id, eval_id,
           |  sum(run)::BIGINT AS n_anchor_hits,
           |  (max(run) + 7)::BIGINT AS max_span_tokens
           |FROM runs WHERE corpus_id <> eval_id
           |GROUP BY 1, 2 ORDER BY corpus_id, eval_id""".stripMargin))

  /** X: incremental near-dup screening
    * ([[graft.dedup.Dedup.incrementalMinHashDedup]]): odd doc_ids are
    * the ingest batch, even doc_ids' stored MinHash signatures are the
    * history — candidates from shared LSH band keys, verified by
    * signature agreement (the Jaccard estimator; history text never
    * rescanned). The oracle replays the bit-compatible md5 minhash in
    * SQL (the q33 machinery) and the same banding + agreement. The
    * returned `sig` column is for history append, not comparison —
    * dropped here (the oracle compares the decision columns). */
  private val q404 = Q("q404_incremental_minhash",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val historySigs = graft.dedup.Dedup.minhashSignatures(
        docs.filter($"doc_id" % 2 === 0), "doc_id", "text")
      graft.dedup.Dedup.incrementalMinHashDedup(
          docs.filter($"doc_id" % 2 === 1), "doc_id", "text",
          historySigs)
        .select($"id", $"is_new", $"matched_history_id",
          $"sig_agreement")
        .orderBy($"id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id AS id, regexp_extract_all(text, '\S+') AS tk
           |  FROM documents),
           |sh AS (
           |  SELECT DISTINCT id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
           |    AS shingle
           |  FROM (SELECT id, tk,
           |          unnest(generate_series(1, len(tk) - 2)) AS i
           |        FROM toks)),
           |idx AS (SELECT unnest(generate_series(0, 15)) AS i),
           |th0 AS (
           |  SELECT id, i,
           |    md5_number_lower(CAST(i AS VARCHAR) || ':' || shingle) AS hu
           |  FROM sh, idx),
           |th AS (
           |  SELECT id, i, (hu::HUGEINT -
           |    CASE WHEN hu >= 9223372036854775808::HUGEINT
           |      THEN 18446744073709551616::HUGEINT
           |      ELSE 0::HUGEINT END)::BIGINT AS h
           |  FROM th0),
           |sigs AS (SELECT id, i, min(h) AS sig FROM th GROUP BY id, i),
           |bk AS (
           |  SELECT id, i // 4 AS band,
           |    string_agg(sig::VARCHAR, ',' ORDER BY i) AS key
           |  FROM sigs GROUP BY id, i // 4),
           |cand AS (
           |  SELECT DISTINCT b.id AS bid, h.id AS hid
           |  FROM bk b JOIN bk h ON b.band = h.band AND b.key = h.key
           |  WHERE b.id % 2 = 1 AND h.id % 2 = 0),
           |agree AS (
           |  SELECT bid, hid,
           |    sum(CASE WHEN sb.sig = sh2.sig THEN 1 ELSE 0 END) / 16.0
           |      AS a
           |  FROM cand
           |    JOIN sigs sb ON sb.id = bid
           |    JOIN sigs sh2 ON sh2.id = hid AND sh2.i = sb.i
           |  GROUP BY bid, hid),
           |best AS (
           |  SELECT bid, hid, a, row_number() OVER (
           |      PARTITION BY bid ORDER BY a DESC, hid) AS rn
           |  FROM agree WHERE a >= 0.5),
           |batch AS (SELECT DISTINCT id FROM sh WHERE id % 2 = 1)
           |SELECT b.id, (best.hid IS NULL) AS is_new,
           |  best.hid AS matched_history_id,
           |  round(best.a, 4) AS sig_agreement
           |FROM batch b
           |  LEFT JOIN best ON best.bid = b.id AND best.rn = 1
           |ORDER BY id""".stripMargin))

  val all: Seq[Q] = Seq(q402, q403, q404)
}
