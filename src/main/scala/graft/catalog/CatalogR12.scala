package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-12 batch: the release-audit
  * triple's missing rung (t-closeness), the modern survival endpoint
  * (fixed-horizon RMST per arm), the normal-theory variance-homogeneity
  * member (Bartlett), set-based retrieval eval (MAP/recall@k), ordinal
  * association (γ / Somers' D / τ_b), the MOSS winnowing sparsifier,
  * uplift evaluation (Qini), and the whole-curve two-sample CvM next
  * to KS.
  */
object CatalogR12 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Mask = (1L << 47) - 1

  /** X316: t-closeness ([[graft.privacy.Privacy.tCloseness]]) of the
    * account-balance band inside each (nation, segment) release class —
    * the distributional rung the k-anonymity (q89) / l-diversity
    * (q244) audits cannot see. The per-value EMD term is the exact
    * integer |cumC·N − cumG·class_size| on both engines; only the
    * final normalization divides. */
  private val q413 = Q("q413_t_closeness",
    (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
        // explicit complete-case BEFORE the band clamp: Spark's
        // greatest/least SKIP nulls, so greatest(0, floor(null)) = 0
        // would silently band a null balance as 0 (fuzz-26 finding —
        // caught by fuzzing this batch the day it landed)
        .filter($"c_acctbal".isNotNull)
        .select($"c_nationkey", $"c_mktsegment",
          least(lit(3L), greatest(lit(0L),
            floor(($"c_acctbal" + 1000) / 2750))).as("bal_band"))
      graft.privacy.Privacy.tCloseness(c,
          Seq("c_nationkey", "c_mktsegment"), "bal_band", t = 0.2)
        .orderBy($"c_nationkey", $"c_mktsegment")
    },
    Some("""WITH base AS (
           |  SELECT c_nationkey, c_mktsegment,
           |    least(3, greatest(0,
           |      floor((c_acctbal + 1000) / 2750)))::BIGINT AS v
           |  FROM customer WHERE c_acctbal IS NOT NULL),
           |cells AS (SELECT c_nationkey, c_mktsegment, v,
           |            count(*)::BIGINT AS c
           |          FROM base GROUP BY 1, 2, 3),
           |cls AS (SELECT c_nationkey, c_mktsegment,
           |          count(*)::BIGINT AS class_size
           |        FROM base GROUP BY 1, 2),
           |gdist AS (SELECT v, count(*)::BIGINT AS gc
           |          FROM base GROUP BY 1),
           |g2 AS (SELECT v,
           |         sum(gc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
           |           PRECEDING AND CURRENT ROW)::BIGINT AS cumg,
           |         sum(gc) OVER ()::BIGINT AS nn,
           |         count(*) OVER ()::BIGINT AS m
           |       FROM gdist),
           |grid AS (SELECT cls.c_nationkey, cls.c_mktsegment,
           |           cls.class_size, g2.v, g2.cumg, g2.nn, g2.m
           |         FROM cls CROSS JOIN g2),
           |dense AS (
           |  SELECT grid.*, coalesce(cells.c, 0)::BIGINT AS c0
           |  FROM grid LEFT JOIN cells
           |    ON cells.c_nationkey IS NOT DISTINCT FROM grid.c_nationkey
           |   AND cells.c_mktsegment IS NOT DISTINCT FROM grid.c_mktsegment
           |   AND cells.v = grid.v),
           |gap AS (
           |  SELECT c_nationkey, c_mktsegment, class_size, nn, m,
           |    abs(sum(c0) OVER (PARTITION BY c_nationkey, c_mktsegment
           |        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
           |        CURRENT ROW) * nn - cumg * class_size)::BIGINT AS g
           |  FROM dense),
           |pc AS (
           |  SELECT c_nationkey, c_mktsegment, class_size,
           |    CASE WHEN max(m) > 1 THEN
           |      round(sum(g)::DOUBLE / (class_size * max(nn))
           |            / (max(m) - 1), 6)
           |    ELSE 0.0 END AS emd
           |  FROM gap GROUP BY 1, 2, 3)
           |SELECT c_nationkey, c_mktsegment, class_size, emd,
           |  emd <= 0.2 AS meets_t, max(emd) OVER () AS max_emd
           |FROM pc ORDER BY c_nationkey, c_mktsegment""".stripMargin))

  /** X317: restricted mean survival time per market segment at a fixed
    * τ = 400 days ([[graft.de.Survival.rmstByGroup]]) over the q168
    * churn construction — mean retained days within the first 400,
    * comparable across arms because τ is shared (the
    * proportional-hazards-free between-arm endpoint). The oracle
    * replays the per-group KM recursion and the duration-ordered step
    * integral. */
  private val q414 = Q("q414_rmst",
    (s, dir) => {
      import s.implicits._
      val u = t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(to_date(min($"o_orderdate")).as("fd"),
          to_date(max($"o_orderdate")).as("ld"))
      val mx = u.agg(max($"ld").as("md"))
      val subj = u.crossJoin(broadcast(mx))
        .join(broadcast(t(s, dir, "customer")),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment",
          datediff($"ld", $"fd").cast("long").as("dur"),
          when(datediff($"md", $"ld") > 180, 1).otherwise(0).as("ev"))
      graft.de.Survival.rmstByGroup(subj, "c_mktsegment", "dur", "ev",
          tau = 400.0)
        .orderBy($"c_mktsegment")
    },
    Some("""WITH u AS (
           |  SELECT o_custkey, min(o_orderdate::DATE) AS fd,
           |         max(o_orderdate::DATE) AS ld
           |  FROM orders GROUP BY 1),
           |mx AS (SELECT max(ld) AS md FROM u),
           |subj AS (
           |  SELECT c.c_mktsegment AS g,
           |    datediff('day', fd, ld)::BIGINT AS t,
           |    CASE WHEN datediff('day', ld, md) > 180 THEN 1
           |         ELSE 0 END AS ev
           |  FROM u CROSS JOIN mx
           |  JOIN customer c ON c.c_custkey = u.o_custkey
           |  -- complete-case on the time axis (rmstByGroup filter)
           |  WHERE fd IS NOT NULL),
           |byt AS (SELECT g, t, sum(ev)::BIGINT AS ne,
           |          sum(1 - ev)::BIGINT AS nc
           |        FROM subj GROUP BY 1, 2),
           |w AS (SELECT g, t, ne, nc,
           |        (sum(ne + nc) OVER (PARTITION BY g)
           |         - coalesce(sum(ne + nc) OVER (PARTITION BY g
           |             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
           |             AND 1 PRECEDING), 0))::BIGINT AS nr,
           |        sum(ne + nc) OVER (PARTITION BY g)::BIGINT AS nsub,
           |        sum(ne) OVER (PARTITION BY g)::BIGINT AS nev
           |      FROM byt),
           |sv AS (SELECT *,
           |         CASE WHEN ne = 0 OR ne = nr THEN 0.0
           |              ELSE ln((nr - ne)::DOUBLE / nr) END AS lt,
           |         min(CASE WHEN ne = nr AND ne > 0 THEN 0 ELSE 1 END)
           |           OVER (PARTITION BY g ORDER BY t ROWS BETWEEN
           |             UNBOUNDED PRECEDING AND CURRENT ROW) AS alive
           |       FROM w),
           |km AS (SELECT g, t, nsub, nev,
           |         CASE WHEN alive = 0 THEN 0.0
           |              ELSE round(exp(sum(lt) OVER (PARTITION BY g
           |                ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
           |                AND CURRENT ROW)), 6) END AS s
           |       FROM sv),
           |seg AS (SELECT g, t, nsub, nev, s,
           |          coalesce(lag(s) OVER (PARTITION BY g ORDER BY t),
           |            1.0) *
           |          (least(t::DOUBLE, 400.0) -
           |           least(coalesce(lag(t) OVER (PARTITION BY g
           |             ORDER BY t), 0)::DOUBLE, 400.0)) AS piece
           |        FROM km),
           |integ AS (SELECT g, t, nsub, nev, s,
           |            sum(piece) OVER (PARTITION BY g ORDER BY t
           |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
           |              ROW) AS cum,
           |            row_number() OVER (PARTITION BY g
           |              ORDER BY t DESC) AS rn
           |          FROM seg)
           |SELECT g AS c_mktsegment, nsub AS n_subjects,
           |  nev AS n_events, t AS t_max, s AS km_end,
           |  round(cum + s * (400.0 - least(t::DOUBLE, 400.0)), 4)
           |    AS rmst
           |FROM integ WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin))

  /** X318: Bartlett homogeneity of order-value variance across the
    * five canonical priorities ([[graft.de.Inference.bartlett]]) —
    * the normal-theory member next to q217's robust Brown–Forsythe;
    * k = 5 pinned by construction so dof = 4 keeps the closed-form χ²
    * tail exact on both engines (the q215/q217 discipline). */
  private val q415 = Q("q415_bartlett",
    (s, dir) => {
      import s.implicits._
      graft.de.Inference.bartlett(
        t(s, dir, "orders").filter($"o_orderpriority".isin("1-URGENT",
          "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
        "o_orderpriority", "o_totalprice")
    },
    Some("""WITH cells AS (
           |  SELECT o_orderpriority AS g, count(*)::BIGINT AS n,
           |    var_samp(o_totalprice) AS s2
           |  FROM orders WHERE o_totalprice IS NOT NULL
           |    AND o_orderpriority IN ('1-URGENT', '2-HIGH',
           |      '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
           |  GROUP BY 1),
           |a AS (SELECT
           |    count(CASE WHEN n >= 2 AND s2 > 0 THEN 1 END)::BIGINT
           |      AS k,
           |    count(CASE WHEN NOT (n >= 2 AND s2 > 0) THEN 1
           |      END)::BIGINT AS k_dropped,
           |    sum(CASE WHEN n >= 2 AND s2 > 0 THEN n END)::BIGINT
           |      AS n,
           |    sum(CASE WHEN n >= 2 AND s2 > 0 THEN (n - 1) * s2 END)
           |      AS ssw,
           |    sum(CASE WHEN n >= 2 AND s2 > 0
           |        THEN (n - 1) * ln(s2) END) AS sln,
           |    sum(CASE WHEN n >= 2 AND s2 > 0 THEN 1.0 / (n - 1) END)
           |      AS sinv
           |  FROM cells),
           |x AS (SELECT k, k_dropped, n,
           |        ssw / (n::DOUBLE - k) AS pooled,
           |        1.0 + (sinv - 1.0 / (n::DOUBLE - k))
           |          / (3.0 * (k::DOUBLE - 1)) AS c,
           |        ((n::DOUBLE - k) * ln(ssw / (n::DOUBLE - k)) - sln)
           |          / (1.0 + (sinv - 1.0 / (n::DOUBLE - k))
           |             / (3.0 * (k::DOUBLE - 1))) AS chi2
           |      FROM a)
           |SELECT k, k_dropped, n, round(sqrt(pooled), 4) AS pooled_sd,
           |  round(c, 6) AS c, round(chi2, 4) AS chi2,
           |  (k - 1)::BIGINT AS dof,
           |  CASE WHEN k = 5 THEN
           |    round(exp(-chi2 / 2) * (1.0 + chi2 / 2), 6) END
           |    AS p_value
           |FROM x""".stripMargin))

  /** X319: MAP@10 / recall@10 per brand over the q266 retrieval
    * construction ([[graft.ml.Ranking.mapAtK]]) — the set-based
    * complement to q266's graded nDCG on the SAME runs, so the two
    * readouts are directly comparable. */
  private val q416 = Q("q416_map_recall",
    (s, dir) => {
      import s.implicits._
      import graft.functions.gfunctions.md5_long
      val scored = t(s, dir, "part").select($"p_brand", $"p_partkey",
        ($"p_size" % 4).cast("double").as("rel"),
        round((md5_long($"p_partkey".cast("string"))
          .bitwiseAND(lit(Mask)).cast("double") / Mask) * 0.5 +
          ($"p_size" % 4) * 0.1, 3).as("score"))
      graft.ml.Ranking.mapAtK(scored, "p_brand", "p_partkey",
          "rel", "score", k = 10, relThreshold = 2.0)
        .orderBy($"p_brand")
    },
    Some("""WITH sc AS (
           |  SELECT p_brand, p_partkey,
           |    (p_size % 4)::DOUBLE AS rel,
           |    round(((md5_number_lower(CAST(p_partkey AS VARCHAR))
           |            & 140737488355327)::DOUBLE / 140737488355327)
           |          * 0.5 + (p_size % 4) * 0.1, 3) AS score
           |  FROM part),
           |r AS (
           |  SELECT p_brand,
           |    CASE WHEN rel >= 2.0 THEN 1 ELSE 0 END AS relb,
           |    row_number() OVER (PARTITION BY p_brand
           |      ORDER BY score DESC, p_partkey) AS pos,
           |    sum(CASE WHEN rel >= 2.0 THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY p_brand
           |        ORDER BY score DESC, p_partkey
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS cumrel
           |  FROM sc
           |  WHERE score IS NOT NULL AND rel IS NOT NULL),
           |a AS (
           |  SELECT p_brand, count(*)::BIGINT AS n_docs,
           |    sum(relb)::BIGINT AS n_rel,
           |    sum(CASE WHEN pos <= 10 AND relb = 1
           |        THEN cumrel::DOUBLE / pos END) AS apsum,
           |    sum(CASE WHEN pos <= 10 THEN relb ELSE 0 END)::BIGINT
           |      AS hits
           |  FROM r GROUP BY 1)
           |SELECT p_brand, n_docs, n_rel,
           |  round(CASE WHEN n_rel > 0 THEN coalesce(apsum, 0.0)
           |        / least(n_rel, 10)::DOUBLE END, 6) AS ap_at_k,
           |  round(CASE WHEN n_rel > 0 THEN hits::DOUBLE / n_rel END,
           |    4) AS recall_at_k
           |FROM a ORDER BY p_brand""".stripMargin))

  /** X320: ordinal association of priority tier vs order-value band
    * ([[graft.de.RankStats.ordinalAssociation]]) — γ, Somers' D_yx
    * (band as response) and τ_b from exact pair counts over the
    * 5×6-bounded cell grid; priority pinned to the five canonical
    * tiers so the digit prefix parses on any data shape (q290's
    * digit-guard lesson). */
  private val q417 = Q("q417_ordinal_assoc",
    (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
        .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH",
          "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW") &&
          // q413's fuzz-26 lesson: Spark greatest/least skip nulls,
          // so the clamp would band a null price as 0
          $"o_totalprice".isNotNull)
        .select(substring($"o_orderpriority", 1, 1).cast("int")
          .as("prio"),
          least(lit(5L), greatest(lit(0L),
            floor($"o_totalprice" / 50000))).as("band"))
      graft.de.RankStats.ordinalAssociation(o, "prio", "band")
    },
    Some("""WITH b AS (
           |  SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS x,
           |    least(5, greatest(0,
           |      floor(o_totalprice / 50000)))::BIGINT AS y
           |  FROM orders
           |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH',
           |      '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
           |    AND o_totalprice IS NOT NULL),
           |cells AS (SELECT x, y, count(*)::BIGINT AS c
           |          FROM b GROUP BY 1, 2),
           |p AS (SELECT a.x, a.y, a.c, b2.x AS x2, b2.y AS y2,
           |        b2.c AS c2
           |      FROM cells a CROSS JOIN cells b2),
           |agg AS (SELECT
           |    (SELECT sum(c) FROM cells)::BIGINT AS n,
           |    sum(CASE WHEN x2 > x AND y2 > y THEN c * c2
           |        ELSE 0 END)::BIGINT AS c,
           |    sum(CASE WHEN x2 > x AND y2 < y THEN c * c2
           |        ELSE 0 END)::BIGINT AS d,
           |    sum(CASE WHEN x2 = x AND y2 > y THEN c * c2
           |        ELSE 0 END)::BIGINT AS tx,
           |    sum(CASE WHEN x2 > x AND y2 = y THEN c * c2
           |        ELSE 0 END)::BIGINT AS ty,
           |    sum(CASE WHEN x2 = x AND y2 = y
           |        THEN c * (c - 1) // 2 ELSE 0 END)::BIGINT AS txy
           |  FROM p)
           |SELECT n, c AS n_concordant, d AS n_discordant,
           |  tx AS t_x, ty AS t_y, txy AS t_xy,
           |  round((c - d)::DOUBLE / nullif((c + d)::DOUBLE, 0), 6)
           |    AS gamma,
           |  round((c - d)::DOUBLE
           |        / nullif((c + d)::DOUBLE + ty, 0), 6)
           |    AS somers_d_yx,
           |  round((c - d)::DOUBLE / nullif(
           |      sqrt(((c + d)::DOUBLE + tx) * ((c + d)::DOUBLE + ty)),
           |      0), 6) AS tau_b
           |FROM agg""".stripMargin))

  /** X321: winnowing fingerprints
    * ([[graft.dedup.Dedup.winnowingFingerprints]], k = 5, w = 4) —
    * per-doc count and min of the MOSS-selected k-gram hashes; the
    * oracle replays gram hashing (md5_number_lower with the q267
    * signed reinterpretation) and the window-min selection
    * independently. */
  private val q418 = Q("q418_winnowing",
    (s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.winnowingFingerprints(
          t(s, dir, "documents"), "doc_id", "text", k = 5, w = 4)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_fingerprints"),
          min($"fingerprint").as("fp_min"))
        .orderBy($"doc_id")
    },
    Some("""WITH tk AS (
           |  SELECT doc_id, regexp_extract_all(text, '\S+') AS t
           |  FROM documents WHERE text IS NOT NULL),
           |tk2 AS (SELECT doc_id, t, len(t)::BIGINT AS n
           |        FROM tk WHERE len(t) >= 8),
           |g AS (SELECT doc_id, n - 4 AS ng,
           |        unnest(range(1, n - 3)) AS p, t
           |      FROM tk2),
           |h AS (SELECT doc_id, ng, p,
           |        md5_number_lower(array_to_string(t[p:p+4], ' '))
           |          AS hu
           |      FROM g),
           |hs AS (SELECT doc_id, ng, p,
           |        (hu::HUGEINT - CASE
           |           WHEN hu >= 9223372036854775808::HUGEINT
           |           THEN 18446744073709551616::HUGEINT
           |           ELSE 0::HUGEINT END)::BIGINT AS h
           |       FROM h),
           |sel AS (SELECT doc_id, ng, p,
           |          min(h) OVER (PARTITION BY doc_id ORDER BY p
           |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS f
           |        FROM hs),
           |fp AS (SELECT DISTINCT doc_id, f FROM sel
           |       WHERE p <= ng - 3)
           |SELECT doc_id, count(*)::BIGINT AS n_fingerprints,
           |  min(f) AS fp_min
           |FROM fp GROUP BY 1 ORDER BY doc_id""".stripMargin))

  /** X322: Qini uplift curve ([[graft.ml.Uplift.qiniCurve]]) — did the
    * (deterministic, outcome-blended) score rank the users whose
    * conversion the even-parity "treatment" moves? The score is
    * PRE-BUCKETED to integer deciles on both sides (an integer-valued
    * double round-trips any engine — the q6 midpoint discipline
    * applied at construction). */
  private val q419 = Q("q419_qini",
    (s, dir) => {
      import s.implicits._
      import graft.functions.gfunctions.md5_long
      val users = t(s, dir, "events")
        .groupBy($"user_id")
        .agg(max(when($"event_type" === "purchase", 1).otherwise(0))
          .as("y"))
      val raw = (md5_long($"user_id".cast("string"))
        .bitwiseAND(lit(Mask)).cast("double") / Mask) * 0.5 +
        $"y" * 0.3 + pmod($"user_id", lit(2)) * $"y" * 0.2
      val scored = users.select(
        pmod($"user_id", lit(2)).cast("int").as("tr"), $"y",
        least(lit(9.0), greatest(lit(0.0), floor(raw * 10)))
          .as("decile"))
      graft.ml.Uplift.qiniCurve(scored, "tr", "y", "decile",
          bucketDp = 0)
        .orderBy($"bucket".desc)
    },
    Some("""WITH u AS (
           |  SELECT user_id,
           |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
           |        END) AS y
           |  FROM events GROUP BY 1),
           |sc AS (
           |  -- the raw-score expression mirrors the Spark side
           |  -- TERM-FOR-TERM (then one *10) so both engines floor the
           |  -- identical double
           |  SELECT (user_id % 2)::INT AS tr, y,
           |    least(9.0, greatest(0.0, floor(
           |      (((md5_number_lower(CAST(user_id AS VARCHAR))
           |         & 140737488355327)::DOUBLE / 140737488355327) * 0.5
           |       + y * 0.3 + (user_id % 2) * y * 0.2) * 10)))
           |      AS decile
           |  FROM u),
           |cells AS (
           |  SELECT round(decile, 0) AS bucket,
           |    sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END)::BIGINT
           |      AS n_treated,
           |    sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END)::BIGINT
           |      AS n_control,
           |    sum(CASE WHEN tr = 1 THEN y ELSE 0 END)::BIGINT
           |      AS conv_treated,
           |    sum(CASE WHEN tr = 0 THEN y ELSE 0 END)::BIGINT
           |      AS conv_control
           |  FROM sc GROUP BY 1),
           |c2 AS (
           |  SELECT *,
           |    sum(n_treated) OVER wd::BIGINT AS cum_n_treated,
           |    sum(n_control) OVER wd::BIGINT AS cum_n_control,
           |    sum(conv_treated) OVER wd::BIGINT AS cum_conv_treated,
           |    sum(conv_control) OVER wd::BIGINT AS cum_conv_control
           |  FROM cells
           |  WINDOW wd AS (ORDER BY bucket DESC ROWS BETWEEN UNBOUNDED
           |    PRECEDING AND CURRENT ROW))
           |SELECT bucket, n_treated, n_control, conv_treated,
           |  conv_control, cum_n_treated, cum_n_control,
           |  cum_conv_treated, cum_conv_control,
           |  round(cum_conv_treated::DOUBLE
           |    - cum_conv_control::DOUBLE * cum_n_treated
           |      / nullif(cum_n_control, 0), 4) AS qini
           |FROM c2 ORDER BY bucket DESC""".stripMargin))

  /** X323: two-sample Cramér–von Mises of event value, even- vs
    * odd-user, per event type ([[graft.de.RankStats.cramerVonMises]])
    * — the whole-curve companion to q144's KS on the q363 parity
    * construction; the squared-gap sum is exact integer (DECIMAL /
    * HUGEINT) on both engines. */
  private val q420 = Q("q420_cvm",
    (s, dir) => {
      import s.implicits._
      graft.de.RankStats.cramerVonMises(
        t(s, dir, "events").select($"event_type",
          when(pmod($"user_id", lit(2)) === 0, "A").otherwise("B")
            .as("grp"),
          $"value"),
        "event_type", "grp", "value", "A", "B")
        .orderBy($"event_type")
    },
    Some("""WITH cells AS (
           |  SELECT event_type, value AS v,
           |    count(CASE WHEN user_id % 2 = 0 THEN 1 END)::BIGINT
           |      AS ca,
           |    count(CASE WHEN user_id % 2 = 1 THEN 1 END)::BIGINT
           |      AS cb
           |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
           |c2 AS (
           |  SELECT event_type, v, ca, cb,
           |    sum(ca) OVER w::BIGINT AS cuma,
           |    sum(cb) OVER w::BIGINT AS cumb,
           |    sum(ca) OVER (PARTITION BY event_type)::BIGINT AS ta,
           |    sum(cb) OVER (PARTITION BY event_type)::BIGINT AS tb
           |  FROM cells
           |  WINDOW w AS (PARTITION BY event_type ORDER BY v
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |t AS (
           |  SELECT event_type, max(ta)::BIGINT AS n_a,
           |    max(tb)::BIGINT AS n_b,
           |    sum((ca + cb)::HUGEINT *
           |        (cuma::HUGEINT * tb - cumb::HUGEINT * ta) *
           |        (cuma::HUGEINT * tb - cumb::HUGEINT * ta)) AS s
           |  FROM c2 GROUP BY 1)
           |SELECT event_type, n_a, n_b,
           |  round(CASE WHEN n_a > 0 AND n_b > 0 THEN s::DOUBLE
           |    / ((n_a + n_b)::DOUBLE * (n_a + n_b)::DOUBLE
           |       * n_a::DOUBLE * n_b::DOUBLE) END, 6) AS t,
           |  round((1.0 + 1.0 / (n_a + n_b)::DOUBLE) / 6.0, 6)
           |    AS t_expected
           |FROM t ORDER BY event_type""".stripMargin))

  val all: Seq[Q] = Seq(q413, q414, q415, q416, q417, q418, q419, q420)
}
