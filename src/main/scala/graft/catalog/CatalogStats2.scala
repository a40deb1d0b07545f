package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch Q (X117+): shape
  * statistics from explicit power sums ([[graft.de.Moments]]),
  * partial correlation ([[graft.ml.Regression.partialCorr]]),
  * Cronbach's alpha, and graph partition quality
  * ([[graft.graph.Modularity]]).
  */
object CatalogStats2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X117: grouped skewness / excess kurtosis
    * ([[graft.de.Moments.groupedMoments]]) from one pass of Σx…Σx⁴ —
    * definition-unambiguous population moments (Spark's and DuckDB's
    * skewness/kurtosis builtins disagree on bias correction, so both
    * engines expand the same binomial formulas; m2^1.5 is written
    * sqrt·multiply to dodge libm pow). */
  private val q227 = Q("q227_moments",
    (s, dir) => {
      import s.implicits._
      graft.de.Moments.groupedMoments(t(s, dir, "customer"),
          "c_mktsegment", "c_acctbal")
        .orderBy($"c_mktsegment")
    },
    Some("""WITH a AS (
           |  SELECT c_mktsegment AS g, count(*)::BIGINT AS n,
           |    sum(c_acctbal) AS s1,
           |    sum(c_acctbal * c_acctbal) AS s2,
           |    sum(c_acctbal * c_acctbal * c_acctbal) AS s3,
           |    sum(c_acctbal * c_acctbal * c_acctbal * c_acctbal) AS s4
           |  FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1),
           |w AS (
           |  SELECT g, n, s1 / n AS m,
           |    s2 / n - (s1 / n) * (s1 / n) AS m2,
           |    s3 / n - 3 * (s1 / n) * s2 / n
           |      + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
           |    s4 / n - 4 * (s1 / n) * s3 / n
           |      + 6 * (s1 / n) * (s1 / n) * s2 / n
           |      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
           |  FROM a)
           |SELECT g AS c_mktsegment, n, round(m, 4) AS mean,
           |  round(sqrt(m2), 4) AS sd,
           |  round(m3 / (sqrt(nullif(m2, 0)) * nullif(m2, 0)), 4)
           |    AS skewness,
           |  round(m4 / (nullif(m2, 0) * nullif(m2, 0)) - 3, 4)
           |    AS kurtosis
           |FROM w ORDER BY c_mktsegment""".stripMargin))

  /** X118: first-order partial correlation
    * ([[graft.ml.Regression.partialCorr]]) — order value vs line count
    * controlling for total quantity; the q224 sufficient statistics in
    * correlation form. */
  private val q228 = Q("q228_partial_corr",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").groupBy($"l_orderkey")
        .agg(count(lit(1)).as("x1"), sum($"l_quantity").as("x2"))
      val j = t(s, dir, "orders")
        .join(li, $"o_orderkey" === $"l_orderkey")
      graft.ml.Regression.partialCorr(j, "x1", "o_totalprice", "x2")
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey, count(*)::DOUBLE AS x1,
           |         sum(l_quantity) AS x2
           |  FROM lineitem GROUP BY 1),
           |j AS (
           |  SELECT x1 AS x, o_totalprice AS y, x2 AS z
           |  FROM orders JOIN li ON o_orderkey = l_orderkey
           |  WHERE o_totalprice IS NOT NULL AND x2 IS NOT NULL),
           |a AS (
           |  SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
           |    sum(z) AS sz, sum(x * x) AS sxx, sum(y * y) AS syy,
           |    sum(z * z) AS szz, sum(x * y) AS sxy, sum(x * z) AS sxz,
           |    sum(y * z) AS syz
           |  FROM j),
           |c AS (
           |  SELECT n,
           |    (sxy - sx * sy / n)
           |      / nullif(sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 0)
           |      AS rxy,
           |    (sxz - sx * sz / n)
           |      / nullif(sqrt((sxx - sx * sx / n) * (szz - sz * sz / n)), 0)
           |      AS rxz,
           |    (syz - sy * sz / n)
           |      / nullif(sqrt((syy - sy * sy / n) * (szz - sz * sz / n)), 0)
           |      AS ryz
           |  FROM a)
           |SELECT n, round(rxy, 4) AS r_xy, round(rxz, 4) AS r_xz,
           |  round(ryz, 4) AS r_yz,
           |  round((rxy - rxz * ryz)
           |    / nullif(sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 0), 4)
           |    AS r_xy_z
           |FROM c""".stripMargin))

  /** X119: Cronbach's alpha ([[graft.de.Moments.cronbachAlpha]]) —
    * event types as items, users as subjects, per-cell value sums
    * zero-filled over the broadcast item grid. */
  private val q229 = Q("q229_cronbach",
    (s, dir) => {
      graft.de.Moments.cronbachAlpha(t(s, dir, "events"),
        "user_id", "event_type", "value")
    },
    Some("""WITH cell AS (
           |  SELECT user_id AS s, event_type AS i, sum(value) AS v
           |  FROM events GROUP BY 1, 2),
           |subs AS (SELECT DISTINCT s FROM cell),
           |its AS (SELECT DISTINCT i FROM cell),
           |f AS (
           |  SELECT subs.s AS s, its.i AS i, coalesce(cell.v, 0.0) AS v
           |  FROM subs CROSS JOIN its
           |  LEFT JOIN cell ON cell.s = subs.s AND cell.i = its.i),
           |iv AS (
           |  SELECT count(*)::BIGINT AS k, sum(vv) AS siv
           |  FROM (SELECT i, var_samp(v) AS vv FROM f GROUP BY 1)),
           |tv AS (
           |  SELECT count(*)::BIGINT AS n_subjects, var_samp(tot) AS tv
           |  FROM (SELECT s, sum(v) AS tot FROM f GROUP BY 1))
           |SELECT k, n_subjects, round(siv, 4) AS sum_item_var,
           |  round(tv, 4) AS total_var,
           |  round(k::DOUBLE / (k - 1) * (1 - siv / nullif(tv, 0)), 4)
           |    AS alpha
           |FROM iv, tv""".stripMargin))

  /** X120: Newman modularity of a given community assignment
    * ([[graft.graph.Modularity.modularity]]) on the q127 lineitem
    * co-occurrence graph, communities = node mod 16 — exact-integer
    * intra-edge/degree mass per community. */
  private val q230 = Q("q230_modularity",
    (s, dir) => {
      import s.implicits._
      val edges = t(s, dir, "lineitem")
        .select(($"l_partkey" % 211).as("src"), ($"l_suppkey" % 211).as("dst"))
      val nodes = edges.select($"src".as("node"))
        .union(edges.select($"dst".as("node"))).distinct()
        .withColumn("community", $"node" % 16)
      graft.graph.Modularity
        .modularity(edges, "src", "dst", nodes, "node", "community")
        .orderBy($"community")
    },
    Some("""WITH e AS (
           |  SELECT DISTINCT least(l_partkey % 211, l_suppkey % 211) AS a,
           |                  greatest(l_partkey % 211, l_suppkey % 211) AS b
           |  FROM lineitem WHERE l_partkey % 211 != l_suppkey % 211),
           |m AS (SELECT count(*)::DOUBLE AS m FROM e),
           |deg AS (
           |  SELECT node, count(*)::BIGINT AS d FROM (
           |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
           |  GROUP BY 1),
           |cm AS (SELECT node, node % 16 AS c FROM deg),
           |degc AS (
           |  SELECT c, count(*)::BIGINT AS n_nodes,
           |    sum(d)::BIGINT AS degree_sum
           |  FROM deg JOIN cm USING (node) GROUP BY 1),
           |intra AS (
           |  SELECT ca.c AS c, count(*)::BIGINT AS intra_edges
           |  FROM e JOIN cm ca ON e.a = ca.node
           |         JOIN cm cb ON e.b = cb.node
           |  WHERE ca.c = cb.c GROUP BY 1),
           |r AS (
           |  SELECT degc.c AS c, n_nodes,
           |    coalesce(intra_edges, 0)::BIGINT AS intra_edges, degree_sum,
           |    coalesce(intra_edges, 0) / m.m
           |      - (degree_sum / (2 * m.m)) * (degree_sum / (2 * m.m)) AS qc
           |  FROM degc LEFT JOIN intra ON degc.c = intra.c, m)
           |SELECT c AS community, n_nodes, intra_edges, degree_sum,
           |  round(qc, 6) AS q_contrib,
           |  round(sum(round(qc, 6)) OVER () * 1e6) / 1e6 AS q_total
           |FROM r ORDER BY community""".stripMargin))

  /** X121: degree assortativity
    * ([[graft.graph.Modularity.assortativity]]) — Pearson correlation
    * of endpoint degrees over the symmetric stub list, exact integer
    * sums. */
  private val q231 = Q("q231_assortativity",
    (s, dir) => {
      import s.implicits._
      val edges = t(s, dir, "lineitem")
        .select(($"l_partkey" % 211).as("src"), ($"l_suppkey" % 211).as("dst"))
      graft.graph.Modularity.assortativity(edges, "src", "dst")
    },
    Some("""WITH e AS (
           |  SELECT DISTINCT least(l_partkey % 211, l_suppkey % 211) AS a,
           |                  greatest(l_partkey % 211, l_suppkey % 211) AS b
           |  FROM lineitem WHERE l_partkey % 211 != l_suppkey % 211),
           |deg AS (
           |  SELECT node, count(*)::BIGINT AS d FROM (
           |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
           |  GROUP BY 1),
           |stubs AS (
           |  SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
           |j AS (
           |  SELECT da.d AS dj, db.d AS dk
           |  FROM stubs JOIN deg da ON stubs.a = da.node
           |             JOIN deg db ON stubs.b = db.node),
           |agg AS (
           |  SELECT count(*)::BIGINT AS cnt, sum(dj) AS sj, sum(dk) AS sk,
           |    sum(dj * dk) AS sjk, sum(dj * dj) AS sjj,
           |    sum(dk * dk) AS skk
           |  FROM j)
           |SELECT (cnt / 2)::BIGINT AS n_edges,
           |  round((sjk - sj * sk / cnt::DOUBLE)
           |    / nullif(sqrt((sjj - sj * sj / cnt::DOUBLE)
           |                  * (skk - sk * sk / cnt::DOUBLE)), 0), 4) AS r
           |FROM agg""".stripMargin))

  val all: Seq[Q] = Seq(q227, q228, q229, q230, q231)
}
