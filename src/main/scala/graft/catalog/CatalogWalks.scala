package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch T (X131+): seeded and
  * attenuated spectral walks (personalized PageRank, Katz — both
  * oracled against q80-style recursive-CTE list replays of the exact
  * fixed-iteration update), second-order Markov transitions,
  * l-diversity audit, and the cohort LTV accumulation matrix.
  */
object CatalogWalks {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def graph211(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val e = t(s, dir, "lineitem")
      .select(least($"l_partkey" % 211, $"l_suppkey" % 211).as("a"),
        greatest($"l_partkey" % 211, $"l_suppkey" % 211).as("b"))
      .filter($"a" =!= $"b").distinct()
    val sym = e.select($"a".as("src"), $"b".as("dst"))
      .union(e.select($"b".as("src"), $"a".as("dst")))
    val nodes = sym.select($"src".as("node")).distinct()
    (nodes, sym)
  }

  private val graphSql =
    """e AS (
      |  SELECT DISTINCT least(l_partkey % 211, l_suppkey % 211) AS a,
      |                  greatest(l_partkey % 211, l_suppkey % 211) AS b
      |  FROM lineitem WHERE l_partkey % 211 != l_suppkey % 211),
      |nd AS (
      |  SELECT node, row_number() OVER (ORDER BY node) AS i
      |  FROM (SELECT DISTINCT a AS node FROM e UNION SELECT b FROM e)),
      |nn AS (SELECT count(*)::BIGINT AS n FROM nd),
      |sym AS (
      |  SELECT na.i AS ui, nb.i AS vi
      |  FROM e JOIN nd na ON e.a = na.node JOIN nd nb ON e.b = nb.node
      |  UNION ALL
      |  SELECT nb.i, na.i
      |  FROM e JOIN nd na ON e.a = na.node JOIN nd nb ON e.b = nb.node),
      |adjl AS (
      |  SELECT list(nb ORDER BY i) AS adj FROM (
      |    SELECT nd.i AS i, coalesce(a.nb, []) AS nb
      |    FROM nd LEFT JOIN (SELECT ui AS i, list(vi ORDER BY vi) AS nb
      |                       FROM sym GROUP BY ui) a USING (i)))""".stripMargin

  /** X131: personalized PageRank / random walk with restart
    * ([[graft.graph.Walks.personalizedPageRank]], seed = node 0,
    * d = 0.85, 20 rounds) on the symmetric q127 graph (every node has
    * degree ≥ 1, so the dangling term is identically zero on both
    * engines). */
  private val q241 = Q("q241_ppr",
    (s, dir) => {
      import s.implicits._
      val (nodes, sym) = graph211(s, dir)
      graft.graph.Walks.personalizedPageRank(s, nodes, sym, seed = 0L)
        .orderBy($"node")
    },
    Some(s"""WITH RECURSIVE
           |$graphSql,
           |si AS (SELECT i AS s FROM nd WHERE node = 0),
           |it AS (
           |  SELECT 0 AS iter,
           |    list_transform(range(1, nn.n + 1), i ->
           |      CASE WHEN i = si.s THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)
           |      AS x
           |  FROM nn, si
           |  UNION ALL
           |  SELECT iter + 1,
           |    list_transform(range(1, nn.n + 1), i ->
           |      0.85 * list_reduce(list_prepend(0.0::DOUBLE,
           |          list_transform(adjl.adj[i],
           |            v -> it.x[v] / len(adjl.adj[v]))),
           |          (acc, v) -> acc + v)
           |      + CASE WHEN i = si.s THEN 0.15::DOUBLE
           |             ELSE 0.0::DOUBLE END) AS x
           |  FROM it, adjl, nn, si WHERE it.iter < 20),
           |fin AS (SELECT x FROM it ORDER BY iter DESC LIMIT 1)
           |SELECT nd.node, round(fin.x[nd.i], 6) AS ppr
           |FROM nd, fin ORDER BY nd.node""".stripMargin))

  /** X132: Katz centrality ([[graft.graph.Walks.katz]], α = 0.002,
    * β = 1, 10 rounds) — attenuated walk counts, no degree
    * normalization; parity holds at any α because both engines run the
    * identical fixed iteration. */
  private val q242 = Q("q242_katz",
    (s, dir) => {
      import s.implicits._
      val (nodes, sym) = graph211(s, dir)
      graft.graph.Walks.katz(s, nodes, sym, alpha = 0.002)
        .orderBy($"node")
    },
    Some(s"""WITH RECURSIVE
           |$graphSql,
           |it AS (
           |  SELECT 0 AS iter,
           |    list_transform(range(1, nn.n + 1), i -> 1.0::DOUBLE) AS x
           |  FROM nn
           |  UNION ALL
           |  SELECT iter + 1,
           |    list_transform(range(1, nn.n + 1), i ->
           |      1.0 + 0.002 * list_reduce(list_prepend(0.0::DOUBLE,
           |        list_transform(adjl.adj[i], v -> it.x[v])),
           |        (acc, v) -> acc + v)) AS x
           |  FROM it, adjl, nn WHERE it.iter < 10),
           |fin AS (SELECT x FROM it ORDER BY iter DESC LIMIT 1)
           |SELECT nd.node, round(fin.x[nd.i], 6) AS katz
           |FROM nd, fin ORDER BY nd.node""".stripMargin))

  /** X133: second-order Markov transitions
    * ([[graft.events.Sessionize.transitionMatrix2]]) — P(next | prev,
    * cur) trigram estimates over per-user event streams. */
  private val q243 = Q("q243_order2_markov",
    (s, dir) => {
      import s.implicits._
      graft.events.Sessionize.transitionMatrix2(t(s, dir, "events"),
          "user_id", "ts", "event_type", tieBreak = Seq("event_id"))
        .orderBy($"prev", $"cur", $"nxt")
    },
    Some("""WITH tg AS (
           |  SELECT event_type AS prev,
           |    lead(event_type, 1) OVER w AS cur,
           |    lead(event_type, 2) OVER w AS nxt
           |  FROM events WHERE ts IS NOT NULL
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |g AS (
           |  SELECT prev, cur, nxt, count(*)::BIGINT AS n
           |  FROM tg WHERE cur IS NOT NULL AND nxt IS NOT NULL
           |  GROUP BY 1, 2, 3)
           |SELECT prev, cur, nxt, n,
           |  round(n / sum(n) OVER (PARTITION BY prev, cur)::DOUBLE, 4)
           |    AS p
           |FROM g ORDER BY prev, cur, nxt""".stripMargin))

  /** X134: l-diversity audit ([[graft.privacy.Privacy.lDiversity]]) —
    * distinct sensitive-bucket count per (nation, segment) class, with
    * the release-level min_l verdict. */
  private val q244 = Q("q244_l_diversity",
    (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
        .withColumn("bal_bucket", floor($"c_acctbal" / 1000))
      graft.privacy.Privacy.lDiversity(c,
          Seq("c_nationkey", "c_mktsegment"), "bal_bucket", l = 3)
        .orderBy($"c_nationkey", $"c_mktsegment")
    },
    Some("""WITH cls AS (
           |  SELECT c_nationkey, c_mktsegment,
           |    count(*)::BIGINT AS class_size,
           |    count(DISTINCT floor(c_acctbal / 1000))::BIGINT
           |      AS l_distinct
           |  FROM customer GROUP BY 1, 2)
           |SELECT c_nationkey, c_mktsegment, class_size, l_distinct,
           |  l_distinct >= 3 AS diverse,
           |  min(l_distinct) OVER () AS min_l
           |FROM cls ORDER BY c_nationkey, c_mktsegment""".stripMargin))

  /** X135: cohort LTV accumulation matrix
    * ([[graft.events.Cohorts.ltvMatrix]]) — cumulative exact-cents
    * revenue per acquisition-year cohort member by age. */
  private val q245 = Q("q245_ltv_matrix",
    (s, dir) => {
      import s.implicits._
      val f = t(s, dir, "orders")
        .filter($"o_orderdate".isNotNull) // null-instant complete-case (fuzz-37)
        .select($"o_custkey".as("k"),
          year($"o_orderdate").as("y"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
      graft.events.Cohorts.ltvMatrix(f, "k", "y", "cents")
        .orderBy($"cohort", $"age")
    },
    Some("""WITH f AS (
           |  SELECT o_custkey AS k, year(o_orderdate)::INT AS y,
           |    round(o_totalprice * 100)::BIGINT AS cents
           |  FROM orders WHERE o_orderdate IS NOT NULL),
           |fi AS (SELECT k, min(y) AS cohort FROM f GROUP BY 1),
           |sz AS (SELECT cohort, count(*)::BIGINT AS cohort_size
           |       FROM fi GROUP BY 1),
           |cells AS (
           |  SELECT fi.cohort AS cohort, f.y - fi.cohort AS age,
           |    sum(cents)::BIGINT AS period_cents
           |  FROM f JOIN fi ON f.k = fi.k GROUP BY 1, 2),
           |c2 AS (
           |  SELECT cohort, age, period_cents,
           |    sum(period_cents) OVER (PARTITION BY cohort ORDER BY age
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           |      AS cum_cents
           |  FROM cells)
           |SELECT cohort, age, cohort_size, period_cents, cum_cents,
           |  round(cum_cents::DOUBLE / cohort_size) / 100.0
           |    AS cum_per_member
           |FROM c2 JOIN sz USING (cohort)
           |ORDER BY cohort, age""".stripMargin))

  val all: Seq[Q] = Seq(q241, q242, q243, q244, q245)
}
