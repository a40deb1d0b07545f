package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch N (X105+): the
  * classical-inference battery ([[graft.de.Inference]]) — one-way
  * ANOVA with an exact closed-form F-tail oracle (d1 = 4 makes
  * I_x(a, 2) = x^a(a+1−ax), so DuckDB needs no numeric integration),
  * Brown–Forsythe homogeneity, Mann–Whitney U with a
  * Simpson-integrated normal-tail oracle (same technique as q14's t
  * tail), and standardized effect sizes.
  */
object CatalogEcon9 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X105: one-way ANOVA ([[graft.de.Inference.oneWayF]]) of order
    * value across the 5 priority classes, scoped per order status.
    * d1 = 4 ⇒ the oracle's F tail is the closed form
    * exp(a·ln x)·(a+1−a·x), a = d2/2, x = d2/(d2+d1·f). */
  private val q215 = Q("q215_anova",
    (s, dir) => {
      import s.implicits._
      // ANOVA across exactly the five canonical priority levels: the
      // oracle's closed-form F tail I_x(d2/2, d1/2) = x^b(b+1-bx) is
      // EXACT iff d1 = k-1 = 4 — pin k by construction so the oracle
      // stays exact on any data shape (the round-11 fuzz injected
      // extra priority classes and broke the approximation, while the
      // engine's t_sf-based tail was exact at any k)
      graft.de.Inference.oneWayF(t(s, dir, "orders")
            .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH",
              "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW") &&
              $"o_orderstatus".isin("F", "O", "P")),
          Seq("o_orderstatus"), "o_orderpriority", "o_totalprice")
        .orderBy($"o_orderstatus")
    },
    Some("""WITH cells AS (
           |  SELECT o_orderstatus AS st, o_orderpriority AS pr,
           |    count(*)::BIGINT AS n, avg(o_totalprice) AS m,
           |    coalesce(var_samp(o_totalprice), 0.0) AS v
           |  FROM orders WHERE o_totalprice IS NOT NULL
           |    AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
           |      '4-NOT SPECIFIED', '5-LOW')
           |    AND o_orderstatus IN ('F', 'O', 'P')
           |  GROUP BY 1, 2),
           |agg AS (
           |  SELECT st, count(*)::BIGINT AS k, sum(n)::BIGINT AS n,
           |    sum(n * m) / sum(n) AS grand,
           |    sum((n - 1) * v) AS ssw,
           |    sum(n * m * m) AS sq
           |  FROM cells GROUP BY 1),
           |w AS (
           |  SELECT st, k, n, (k - 1)::DOUBLE AS d1, (n - k)::DOUBLE AS d2,
           |    ((sq - n * grand * grand) / ((k - 1)::DOUBLE))
           |      / nullif(ssw / ((n - k)::DOUBLE), 0) AS f
           |  FROM agg)
           |SELECT st AS o_orderstatus, k, n, round(f, 4) AS f_stat,
           |  d1::BIGINT AS df1, d2::BIGINT AS df2,
           |  round(exp((d2 / 2) * ln(d2 / (d2 + d1 * f))) *
           |        (d2 / 2 + 1 - (d2 / 2) * (d2 / (d2 + d1 * f))), 6)
           |    AS p_value
           |FROM w ORDER BY o_orderstatus""".stripMargin))

  /** X106: Mann–Whitney U ([[graft.de.Inference.mannWhitney]]) on
    * order value, fulfilled vs open, per priority class. Exact
    * integer midrank×2 arithmetic on both engines; the oracle
    * Simpson-integrates the standard-normal pdf over [0, |z|]
    * (p = 1 − 2∫, i.e. erfc(|z|/√2)). */
  private val q216 = Q("q216_mann_whitney",
    (s, dir) => {
      import s.implicits._
      graft.de.Inference.mannWhitney(t(s, dir, "orders"),
          "o_orderpriority", "o_orderstatus", "o_totalprice", "F", "O")
        .orderBy($"o_orderpriority")
    },
    Some("""WITH inp AS (
           |  SELECT o_orderpriority AS s, o_orderstatus AS c,
           |         o_totalprice AS v
           |  FROM orders
           |  WHERE o_orderstatus IN ('F', 'O') AND o_totalprice IS NOT NULL),
           |cells AS (SELECT s, c, v, count(*)::BIGINT AS cnt
           |          FROM inp GROUP BY 1, 2, 3),
           |perval AS (SELECT s, v, sum(cnt)::BIGINT AS t
           |           FROM cells GROUP BY 1, 2),
           |ranked AS (
           |  SELECT s, v,
           |    2 * coalesce(sum(t) OVER (PARTITION BY s ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      + t + 1 AS r2
           |  FROM perval),
           |percls AS (
           |  SELECT cells.s AS s,
           |    sum(CASE WHEN c = 'F' THEN cnt ELSE 0 END)::BIGINT AS n_a,
           |    sum(CASE WHEN c = 'O' THEN cnt ELSE 0 END)::BIGINT AS n_b,
           |    sum(CASE WHEN c = 'F' THEN cnt * r2 ELSE 0 END)::BIGINT AS r2a
           |  FROM cells JOIN ranked
           |    ON cells.s = ranked.s AND cells.v = ranked.v
           |  GROUP BY 1),
           |ties AS (SELECT s, sum(t * t * t - t)::DOUBLE AS tt
           |         FROM perval GROUP BY 1),
           |stat AS (
           |  SELECT p.s AS s, n_a, n_b,
           |    r2a / 2.0 - n_a::DOUBLE * (n_a + 1) / 2 AS u,
           |    (r2a / 2.0 - n_a::DOUBLE * (n_a + 1) / 2
           |       - n_a::DOUBLE * n_b / 2) /
           |      nullif(sqrt(n_a::DOUBLE * n_b / 12 *
           |        ((n_a + n_b + 1)
           |          - tt / nullif((n_a + n_b)::DOUBLE
           |                        * (n_a + n_b - 1), 0))), 0) AS z
           |  FROM percls p JOIN ties ON p.s = ties.s),
           |grid AS (SELECT s, abs(z) AS az,
           |           unnest(generate_series(0, 20000)) AS i
           |         FROM stat),
           |pts AS (SELECT s, az * i / 20000 AS x,
           |          CASE WHEN i = 0 OR i = 20000 THEN 1
           |               WHEN i % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          az / 20000 AS h
           |        FROM grid),
           |ig AS (SELECT s,
           |         sum(wt * exp(-x * x / 2)) * max(h) / 3.0
           |           / sqrt(2 * pi()) AS phi
           |       FROM pts GROUP BY s)
           |SELECT stat.s AS o_orderpriority, n_a, n_b, round(u, 1) AS u,
           |  round(z, 4) AS z, round(1.0 - 2.0 * phi, 6) AS p_value
           |FROM stat JOIN ig ON stat.s = ig.s
           |ORDER BY o_orderpriority""".stripMargin))

  /** X107: Brown–Forsythe homogeneity of variance
    * ([[graft.de.Inference.brownForsythe]]) of account balances across
    * market segments — ANOVA on |x − group median|; exact continuous
    * medians on both engines; same closed-form F tail as q215. */
  private val q217 = Q("q217_brown_forsythe",
    (s, dir) => {
      import s.implicits._
      // pinned to the five canonical segments — q215's discipline: the
      // oracle's closed-form F tail is exact iff d1 = k-1 = 4, and the
      // fuzz injects extra segment classes (the engine's tail is exact
      // at any k; only the oracle's closed form is k-bound)
      graft.de.Inference.brownForsythe(t(s, dir, "customer")
          .filter($"c_mktsegment".isin("AUTOMOBILE", "BUILDING",
            "FURNITURE", "HOUSEHOLD", "MACHINERY")),
        "c_mktsegment", "c_acctbal")
    },
    Some("""WITH med AS (
           |  SELECT c_mktsegment AS g, median(c_acctbal) AS md
           |  FROM customer WHERE c_acctbal IS NOT NULL
           |    AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING',
           |      'FURNITURE', 'HOUSEHOLD', 'MACHINERY')
           |  GROUP BY 1),
           |dev AS (
           |  SELECT c.c_mktsegment AS g, abs(c_acctbal - md) AS z
           |  FROM customer c JOIN med ON c.c_mktsegment = med.g
           |  WHERE c_acctbal IS NOT NULL),
           |cells AS (SELECT g, count(*)::BIGINT AS n, avg(z) AS m,
           |            coalesce(var_samp(z), 0.0) AS v
           |          FROM dev GROUP BY 1),
           |agg AS (
           |  SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n,
           |    sum(n * m) / sum(n) AS grand,
           |    sum((n - 1) * v) AS ssw,
           |    sum(n * m * m) AS sq
           |  FROM cells),
           |w AS (
           |  SELECT k, n, (k - 1)::DOUBLE AS d1, (n - k)::DOUBLE AS d2,
           |    ((sq - n * grand * grand) / ((k - 1)::DOUBLE))
           |      / nullif(ssw / ((n - k)::DOUBLE), 0) AS f
           |  FROM agg)
           |SELECT k, n, round(f, 4) AS w_stat,
           |  d1::BIGINT AS df1, d2::BIGINT AS df2,
           |  round(exp((d2 / 2) * ln(d2 / (d2 + d1 * f))) *
           |        (d2 / 2 + 1 - (d2 / 2) * (d2 / (d2 + d1 * f))), 6)
           |    AS p_value
           |FROM w""".stripMargin))

  /** X108: standardized effect sizes
    * ([[graft.de.Inference.effectSizes]]) — Cohen's d / Hedges' g /
    * Glass's Δ of returned-vs-delivered line price per brand. Pure
    * sufficient statistics; broadcast dimension join. */
  private val q218 = Q("q218_effect_sizes",
    (s, dir) => {
      import s.implicits._
      val j = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
      graft.de.Inference.effectSizes(j, Seq("p_brand"), "l_returnflag",
          "l_extendedprice", "A", "N")
        .orderBy($"p_brand")
    },
    Some("""WITH j AS (
           |  SELECT p_brand, l_returnflag AS g, l_extendedprice AS v
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  WHERE l_returnflag IN ('A', 'N')),
           |a AS (
           |  SELECT p_brand,
           |    count(CASE WHEN g = 'A' THEN 1 END)::BIGINT AS n_case,
           |    count(CASE WHEN g = 'N' THEN 1 END)::BIGINT AS n_ctrl,
           |    avg(CASE WHEN g = 'A' THEN v END) AS mc,
           |    avg(CASE WHEN g = 'N' THEN v END) AS mk,
           |    var_samp(CASE WHEN g = 'A' THEN v END) AS vc,
           |    var_samp(CASE WHEN g = 'N' THEN v END) AS vk
           |  FROM j GROUP BY 1),
           |e AS (
           |  SELECT p_brand, n_case, n_ctrl, mc - mk AS diff,
           |    sqrt(((n_case - 1) * vc + (n_ctrl - 1) * vk)
           |         / nullif(n_case + n_ctrl - 2, 0)) AS pooled,
           |    sqrt(vk) AS sk,
           |    1.0 - 3.0 / (4 * (n_case + n_ctrl) - 9) AS j
           |  FROM a)
           |SELECT p_brand, n_case, n_ctrl,
           |  round(diff, 4) AS mean_diff,
           |  round(diff / nullif(pooled, 0), 4) AS cohen_d,
           |  round(diff / nullif(pooled, 0) * j, 4) AS hedges_g,
           |  round(diff / nullif(sk, 0), 4) AS glass_delta
           |FROM e ORDER BY p_brand""".stripMargin))

  val all: Seq[Q] = Seq(q215, q216, q217, q218)
}
