package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-8 batch: ordinal agreement
  * (X263 weighted κ), imbalance-honest classification (X264 MCC
  * panel), and exact Bayesian A/B (X265).
  */
object CatalogStats4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X263: linear + quadratic weighted Cohen's κ between two derived
    * ordinal ratings of event value — exact integer confusion cells,
    * margin-domain-bounded grid. */
  private val q370 = Q("q370_weighted_kappa",
    (s, dir) => {
      import s.implicits._
      graft.ml.Metrics.weightedKappa(
        t(s, dir, "events").filter($"value".isNotNull)
          .select(
            least(lit(3L), floor($"value" / 25)).as("ra"),
            greatest(lit(0L), least(lit(3L),
              floor(($"value" + pmod($"event_id", lit(7)) - 3) / 25)))
              .as("rb")),
        "ra", "rb")
    },
    Some("""WITH r AS (
           |  SELECT least(3, floor(value / 25))::BIGINT AS i,
           |    greatest(0, least(3,
           |      floor((value + event_id % 7 - 3) / 25)))::BIGINT AS j
           |  FROM events WHERE value IS NOT NULL),
           |cl AS (SELECT i, j, count(*)::BIGINT AS c
           |       FROM r GROUP BY 1, 2),
           |ra AS (SELECT i, sum(c) AS ri FROM cl GROUP BY 1),
           |rb AS (SELECT j, sum(c) AS cj FROM cl GROUP BY 1),
           |g AS (
           |  SELECT ra.i, rb.j, ri, cj, coalesce(c, 0) AS c,
           |    abs(ra.i - rb.j)::DOUBLE AS d
           |  FROM ra CROSS JOIN rb
           |  LEFT JOIN cl ON cl.i = ra.i AND cl.j = rb.j),
           |n AS (SELECT sum(c)::BIGINT AS n FROM cl),
           |k AS (SELECT count(DISTINCT v)::BIGINT AS n_categories
           |      FROM (SELECT i AS v FROM r UNION ALL
           |            SELECT j FROM r)),
           |s AS (SELECT sum(d * c) AS ol, sum(d * d * c) AS oq,
           |        sum(d * ri * cj) AS el, sum(d * d * ri * cj) AS eq
           |      FROM g)
           |SELECT n, n_categories,
           |  round(1 - ol * n / nullif(el, 0), 4) AS kappa_linear,
           |  round(1 - oq * n / nullif(eq, 0), 4) AS kappa_quadratic
           |FROM n CROSS JOIN k CROSS JOIN s""".stripMargin))

  /** X264: multiclass Matthews correlation (R_K) + balanced accuracy
    * over a deterministic 1-in-5 label corruption — exact BIGINT
    * confusion margins. */
  private val q371 = Q("q371_mcc_panel",
    (s, dir) => {
      import s.implicits._
      graft.ml.Metrics.mccPanel(
        t(s, dir, "events").select(
          $"event_type".as("y"),
          when(pmod($"event_id", lit(5)) === 0, lit("view"))
            .otherwise($"event_type").as("p")),
        "y", "p")
    },
    Some("""WITH pairs AS (
           |  SELECT event_type AS y,
           |    CASE WHEN event_id % 5 = 0 THEN 'view'
           |         ELSE event_type END AS p
           |  FROM events),
           |cl AS (SELECT y, p, count(*)::BIGINT AS c
           |       FROM pairs GROUP BY 1, 2),
           |tk AS (SELECT y AS cls, sum(c) AS t FROM cl GROUP BY 1),
           |pk AS (SELECT p AS cls, sum(c) AS pc FROM cl GROUP BY 1),
           |tp AS (SELECT y AS cls, c AS tp FROM cl WHERE y = p),
           |m AS (
           |  SELECT coalesce(tk.cls, pk.cls) AS cls,
           |    coalesce(t, 0) AS t, coalesce(pc, 0) AS pc,
           |    coalesce(tp, 0) AS tp
           |  FROM tk FULL OUTER JOIN pk ON tk.cls = pk.cls
           |  LEFT JOIN tp ON coalesce(tk.cls, pk.cls) = tp.cls),
           |a AS (
           |  SELECT sum(t)::BIGINT AS s, sum(tp) AS c,
           |    sum(t * pc) AS tpdot, sum(t * t) AS tt,
           |    sum(pc * pc) AS pp,
           |    avg(CASE WHEN t > 0 THEN tp::DOUBLE / t END) AS bacc
           |  FROM m)
           |SELECT s AS n, round(c::DOUBLE / s, 4) AS accuracy,
           |  round(bacc, 4) AS balanced_accuracy,
           |  round((c * s - tpdot)::DOUBLE /
           |    nullif(sqrt((s * s - pp)::DOUBLE * (s * s - tt)::DOUBLE),
           |      0), 4) AS mcc
           |FROM a""".stripMargin))

  /** X265: exact Bayesian P(p_B > p_A) per event type over md5-parity
    * cohorts — both engines sum the identical closed-form series off
    * the SAME sequential Σln-factorial table (the q301 discipline). */
  private val q372 = Q("q372_bayes_ab",
    (s, dir) => {
      import s.implicits._
      import graft.functions.gfunctions.md5_long
      graft.de.Experiment.bayesAb(
        t(s, dir, "events").select($"event_type",
          when(md5_long($"user_id".cast("string"))
            .bitwiseAND(lit(1L)) === 0, "A").otherwise("B").as("grp"),
          when($"value" > 80, 1).otherwise(0).as("x")),
        "event_type", "grp", "x")
        .orderBy($"event_type")
    },
    Some("""WITH obs AS (
           |  SELECT event_type,
           |    CASE WHEN (md5_number_lower(CAST(user_id AS VARCHAR))
           |               & 1) = 0 THEN 'A' ELSE 'B' END AS grp,
           |    CASE WHEN value > 80 THEN 1 ELSE 0 END AS x
           |  FROM events),
           |cnt AS (
           |  SELECT event_type AS s,
           |    count(CASE WHEN grp = 'A' THEN 1 END)::BIGINT AS n_a,
           |    count(CASE WHEN grp = 'A' AND x = 1 THEN 1
           |          END)::BIGINT AS s_a,
           |    count(CASE WHEN grp = 'B' THEN 1 END)::BIGINT AS n_b,
           |    count(CASE WHEN grp = 'B' AND x = 1 THEN 1
           |          END)::BIGINT AS s_b
           |  FROM obs GROUP BY 1),
           |par AS (SELECT *, s_a + 1 AS a1, n_a - s_a + 1 AS b1,
           |          s_b + 1 AS a2, n_b - s_b + 1 AS b2
           |        FROM cnt),
           |lf AS (SELECT i AS id,
           |    sum(CASE WHEN i > 0 THEN ln(i::DOUBLE) ELSE 0 END)
           |      OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND
           |            CURRENT ROW) AS lf
           |  FROM (SELECT unnest(generate_series(0, mx + 3)) AS i
           |        FROM (SELECT max(n_a + n_b) AS mx FROM cnt))),
           |grid AS (SELECT p.*, unnest(generate_series(0, a2 - 1)) AS i
           |         FROM par p WHERE n_a > 0 AND n_b > 0),
           |terms AS (SELECT g.s,
           |    (SELECT lf FROM lf WHERE id = g.a1 + g.i - 1)
           |    + (SELECT lf FROM lf WHERE id = g.b1 + g.b2 - 1)
           |    - (SELECT lf FROM lf
           |       WHERE id = g.a1 + g.i + g.b1 + g.b2 - 1)
           |    - ln((g.b2 + g.i)::DOUBLE)
           |    - ((SELECT lf FROM lf WHERE id = g.i)
           |       + (SELECT lf FROM lf WHERE id = g.b2 - 1)
           |       - (SELECT lf FROM lf WHERE id = g.i + g.b2))
           |    - ((SELECT lf FROM lf WHERE id = g.a1 - 1)
           |       + (SELECT lf FROM lf WHERE id = g.b1 - 1)
           |       - (SELECT lf FROM lf WHERE id = g.a1 + g.b1 - 1))
           |      AS lnt
           |  FROM grid g),
           |p AS (SELECT s, sum(exp(lnt)) AS p FROM terms GROUP BY 1)
           |SELECT cnt.s AS event_type, n_a, s_a, n_b, s_b,
           |  round(s_a::DOUBLE / nullif(n_a, 0), 4) AS rate_a,
           |  round(s_b::DOUBLE / nullif(n_b, 0), 4) AS rate_b,
           |  round(p.p, 6) AS p_b_beats_a
           |FROM cnt LEFT JOIN p USING (s)
           |ORDER BY event_type""".stripMargin))

  val all: Seq[Q] = Seq(q370, q371, q372)
}
