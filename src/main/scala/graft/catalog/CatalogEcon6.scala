package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch K (X92+): embedding
  * cluster quality, classification evaluation, drift monitoring,
  * weighted quantiles, null-semantics coverage. Conventions follow
  * Catalog.scala.
  */
object CatalogEcon6 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val silhouetteOracleCore =
    """WITH pts AS (SELECT vec_id, label::BIGINT AS lbl, embedding
      |            FROM embeddings),
      |dims AS (SELECT lbl, i, avg(embedding[i]::DOUBLE) AS m
      |         FROM pts, UNNEST(range(1, len(embedding) + 1)) AS r(i)
      |         GROUP BY 1, 2),
      |dist AS (SELECT p.vec_id, p.lbl, d.lbl AS clbl,
      |           round(sqrt(sum(
      |             (p.embedding[d.i]::DOUBLE - d.m) *
      |             (p.embedding[d.i]::DOUBLE - d.m))), 6) AS dst
      |         FROM pts p JOIN dims d ON true
      |         GROUP BY 1, 2, 3),
      |own AS (SELECT vec_id, lbl, dst AS a FROM dist WHERE clbl = lbl),
      |oth AS (SELECT vec_id, dst AS b, clbl,
      |          row_number() OVER (PARTITION BY vec_id
      |            ORDER BY dst, clbl) AS rn
      |        FROM dist WHERE clbl <> lbl),
      |sil AS (SELECT own.vec_id, own.lbl, own.a, oth.b,
      |          CASE WHEN own.a <= oth.b THEN own.lbl
      |               ELSE oth.clbl END AS pred,
      |          CASE WHEN greatest(own.a, oth.b) > 0
      |               THEN round((oth.b - own.a) /
      |                          greatest(own.a, oth.b), 4)
      |               ELSE 0.0 END AS s
      |        FROM own JOIN oth
      |          ON oth.vec_id = own.vec_id AND oth.rn = 1)""".stripMargin

  /** X92: simplified silhouette of the embedding labels
    * ([[graft.ml.ClusterMetrics.silhouetteByLabel]]) — centroid
    * distances 6-dp-rounded BEFORE the argmin so mean-accumulation
    * noise can't flip the nearest label; label rollup with
    * misassignment counts. */
  private val q200 = Q("q200_silhouette",
    (s, dir) => {
      import s.implicits._
      graft.ml.ClusterMetrics.silhouetteByLabel(
          t(s, dir, "embeddings"), "vec_id", "label", "embedding")
        .orderBy($"label")
    },
    Some(silhouetteOracleCore +
      """
        |SELECT lbl AS label, count(*)::BIGINT AS n,
        |  round(sum(round(s, 4)) * 10000) / (10000 * count(*))
        |    AS mean_silhouette,
        |  sum(CASE WHEN pred <> lbl THEN 1 ELSE 0 END)::BIGINT
        |    AS n_misassigned
        |FROM sil GROUP BY 1 ORDER BY label""".stripMargin))

  /** X93: per-class precision/recall/F1 of the nearest-centroid
    * classifier against the true embedding labels
    * ([[graft.ml.Metrics.classificationReport]] over X92's
    * predictions) — confusion cells are one hash aggregate; every
    * ratio from exact BIGINTs. */
  private val q201 = Q("q201_classification_report",
    (s, dir) => {
      import s.implicits._
      val pairs = graft.ml.ClusterMetrics.simplifiedSilhouette(
        t(s, dir, "embeddings"), "vec_id", "label", "embedding")
      graft.ml.Metrics.classificationReport(pairs, "label", "pred_label")
        .orderBy($"cls")
    },
    Some(silhouetteOracleCore +
      """,
        |cl AS (SELECT lbl::VARCHAR AS y, pred::VARCHAR AS p,
        |         count(*)::BIGINT AS c
        |       FROM sil GROUP BY 1, 2),
        |bt AS (SELECT y AS cls, sum(c)::BIGINT AS support
        |       FROM cl GROUP BY 1),
        |bp AS (SELECT p AS cls, sum(c)::BIGINT AS predicted
        |       FROM cl GROUP BY 1),
        |tp AS (SELECT y AS cls, c AS tp FROM cl WHERE y = p),
        |base AS (SELECT coalesce(bt.cls, bp.cls) AS cls,
        |           coalesce(support, 0)::BIGINT AS support,
        |           coalesce(predicted, 0)::BIGINT AS predicted,
        |           coalesce(tp, 0)::BIGINT AS tp
        |         FROM bt FULL JOIN bp ON bp.cls = bt.cls
        |         LEFT JOIN tp ON tp.cls = coalesce(bt.cls, bp.cls))
        |SELECT cls, support, tp,
        |  (predicted - tp)::BIGINT AS fp,
        |  (support - tp)::BIGINT AS fn,
        |  round(tp::DOUBLE / nullif(predicted, 0), 4) AS "precision",
        |  round(tp::DOUBLE / nullif(support, 0), 4) AS recall,
        |  round(2.0 * tp / nullif(predicted + support, 0), 4) AS f1
        |FROM base ORDER BY cls""".stripMargin))

  /** X94: agreement panel — accuracy, macro-F1, Cohen's κ of the same
    * classifier ([[graft.ml.Metrics.agreement]]); κ from the margin
    * product in exact integers. */
  private val q202 = Q("q202_cohens_kappa",
    (s, dir) => {
      graft.ml.Metrics.agreement(
        graft.ml.ClusterMetrics.simplifiedSilhouette(
          t(s, dir, "embeddings"), "vec_id", "label", "embedding"),
        "label", "pred_label")
    },
    Some(silhouetteOracleCore +
      """,
        |cl AS (SELECT lbl::VARCHAR AS y, pred::VARCHAR AS p,
        |         count(*)::BIGINT AS c
        |       FROM sil GROUP BY 1, 2),
        |nn AS (SELECT sum(c)::BIGINT AS n,
        |         sum(CASE WHEN y = p THEN c ELSE 0 END)::BIGINT AS ok
        |       FROM cl),
        |mg AS (SELECT coalesce(a.cls, b.cls) AS cls,
        |         coalesce(ny, 0)::BIGINT AS ny,
        |         coalesce(np, 0)::BIGINT AS np
        |       FROM (SELECT y AS cls, sum(c)::BIGINT AS ny
        |             FROM cl GROUP BY 1) a
        |       FULL JOIN (SELECT p AS cls, sum(c)::BIGINT AS np
        |                  FROM cl GROUP BY 1) b ON b.cls = a.cls),
        |pe AS (SELECT sum(ny * np)::BIGINT AS sump FROM mg),
        |f1s AS (SELECT coalesce(round(
        |          2.0 * coalesce(tp, 0) / nullif(predicted + support, 0),
        |          4), 0.0) AS f1
        |        FROM (SELECT y AS cls, sum(c)::BIGINT AS support
        |              FROM cl GROUP BY 1) bt
        |        LEFT JOIN (SELECT p AS cls, sum(c)::BIGINT AS predicted
        |                   FROM cl GROUP BY 1) bp USING (cls)
        |        LEFT JOIN (SELECT y AS cls, c AS tp FROM cl
        |                   WHERE y = p) tp USING (cls)
        |        WHERE support > 0),
        |mf AS (SELECT round(sum(f1) * 1e4) / (1e4 * count(*)) AS mf1
        |       FROM f1s)
        |SELECT n, round(ok::DOUBLE / n, 4) AS accuracy,
        |  mf1 AS macro_f1,
        |  round(sump::DOUBLE / (n * n), 4) AS expected_agreement,
        |  CASE WHEN sump < n * n THEN
        |    round((ok::DOUBLE / n - sump::DOUBLE / (n * n)) /
        |          (1.0 - sump::DOUBLE / (n * n)), 4)
        |  END AS cohens_kappa
        |FROM nn, pe, mf""".stripMargin))

  /** X95: population stability index of order totals, pre-1998 vs
    * after ([[graft.de.Drift.psi]]) — X38 integer-exact equi-width
    * bins over the global range, Laplace-smoothed shares. */
  private val q203 = Q("q203_psi",
    (s, dir) => {
      import s.implicits._
      val v = t(s, dir, "orders")
        .select(round($"o_totalprice" * 100).cast("long").as("cents"),
          ($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
            .as("is_base"))
      graft.de.Drift.psi(v, "cents", "is_base", nBins = 10)
        .orderBy($"bin")
    },
    Some("""WITH v AS (
           |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           |         o_orderdate < TIMESTAMP '1998-01-01' AS is_base
           |  FROM orders),
           |bd AS (SELECT min(cents) AS lo, max(cents) AS hi FROM v),
           |bn AS (SELECT least(9, ((cents - lo) * 10) //
           |           greatest(hi - lo + 1, 1)) AS bin,
           |         lo, hi, is_base
           |       FROM v, bd),
           |byb AS (SELECT bin, max(lo) AS glo, max(hi) AS ghi,
           |          sum(CASE WHEN is_base THEN 1 ELSE 0 END)::BIGINT
           |            AS n_a,
           |          sum(CASE WHEN NOT is_base THEN 1 ELSE 0
           |          END)::BIGINT AS n_b
           |        FROM bn GROUP BY 1),
           |tt AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb
           |       FROM byb)
           |SELECT bin::BIGINT AS bin,
           |  (glo + bin * ((ghi - glo + 1) // 10))::BIGINT AS lo_approx,
           |  n_a, n_b,
           |  round((n_a + 1)::DOUBLE / (ta + 10), 6) AS p_a,
           |  round((n_b + 1)::DOUBLE / (tb + 10), 6) AS p_b,
           |  round(((n_b + 1)::DOUBLE / (tb + 10)
           |         - (n_a + 1)::DOUBLE / (ta + 10)) *
           |        ln(((n_b + 1)::DOUBLE / (tb + 10)) /
           |           ((n_a + 1)::DOUBLE / (ta + 10))), 6) AS psi_term
           |FROM byb, tt ORDER BY bin""".stripMargin))

  /** X96: generalized lower weighted quantiles (25/50/75/90) of line
    * price weighted by quantity
    * ([[graft.de.RobustStats.weightedQuantiles]]) — pure-integer
    * threshold decisions, all quantiles on one cell sort. */
  private val q204 = Q("q204_weighted_quantiles",
    (s, dir) => {
      import s.implicits._
      val v = t(s, dir, "lineitem")
        .select($"l_returnflag",
          round($"l_extendedprice" * 100).cast("long").as("cents"),
          $"l_quantity".cast("long").as("w"))
      graft.de.RobustStats.weightedQuantiles(v, "l_returnflag", "cents",
          "w", qs = Seq(25, 50, 75, 90))
        .orderBy($"l_returnflag", $"q")
    },
    Some("""WITH cells AS (
           |  SELECT l_returnflag AS g,
           |         CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
           |         sum(CAST(l_quantity AS BIGINT))::BIGINT AS w
           |  FROM lineitem
           |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
           |  GROUP BY 1, 2),
           |c2 AS (
           |  SELECT g, v, w,
           |         sum(w) OVER (PARTITION BY g ORDER BY v
           |           ROWS BETWEEN UNBOUNDED PRECEDING
           |           AND CURRENT ROW) AS cum,
           |         sum(w) OVER (PARTITION BY g) AS tot
           |  FROM cells),
           |qq AS (SELECT unnest([25, 50, 75, 90]) AS q)
           |SELECT g AS l_returnflag, qq.q::INT AS q,
           |  min(v) AS "value", max(tot)::BIGINT AS total_weight
           |FROM c2, qq WHERE cum * 100 >= qq.q * tot
           |GROUP BY 1, 2 ORDER BY l_returnflag, q""".stripMargin))

  /** §2.6 widening: null-semantics battery — nullif, null-safe
    * equality (<=> vs IS NOT DISTINCT FROM), coalesce defaults —
    * grouped so the compare pins every branch's cardinality. */
  private val q205 = Q("q205_null_semantics",
    (s, dir) => {
      import s.implicits._
      val st = nullif($"o_orderstatus", lit("O"))
      t(s, dir, "orders")
        .select($"o_orderstatus".as("status"),
          ($"o_orderstatus" <=> st).as("nullsafe_eq"),
          coalesce(st, lit("suppressed")).as("effective"))
        .groupBy($"status", $"nullsafe_eq", $"effective")
        .agg(count(lit(1)).as("n"))
        .orderBy($"status")
    },
    Some("""SELECT o_orderstatus AS status,
           |  o_orderstatus IS NOT DISTINCT FROM
           |    nullif(o_orderstatus, 'O') AS nullsafe_eq,
           |  coalesce(nullif(o_orderstatus, 'O'), 'suppressed')
           |    AS effective,
           |  count(*)::BIGINT AS n
           |FROM orders GROUP BY 1, 2, 3
           |ORDER BY status""".stripMargin))

  val all: Seq[Q] = Seq(q200, q201, q202, q203, q204, q205)
}
