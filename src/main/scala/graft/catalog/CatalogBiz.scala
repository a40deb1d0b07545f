package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch S (X127+): label
  * propagation communities (oracled against a list-based recursive-CTE
  * replay of the identical synchronous update — the q80 PageRank
  * technique, extended to the mode-with-min-tiebreak vote via nested
  * list lambdas), seasonal-naive forecast backtesting, exact-integer
  * ABC classification, and log-log price elasticity.
  */
object CatalogBiz {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // mode-with-min-tiebreak of the neighbor-label list for node index i,
  // given labels list x and adjacency adjl.adj — inlined three times
  // (candidates, counts, argmax) because list lambdas cannot bind
  // intermediate names.
  private val lbls = "list_transform(adjl.adj[i], v -> it.x[v])"
  private val cands = s"list_sort(list_distinct($lbls))"
  private val cnts =
    s"list_transform($cands, c -> len(list_filter($lbls, z -> z = c)))"
  private val winner =
    s"$cands[list_position($cnts, list_aggregate($cnts, 'max'))]"

  /** X127: synchronous label propagation
    * ([[graft.graph.LabelProp.propagate]], 5 rounds, smallest-label
    * tie-break) on the q127 co-occurrence graph. The oracle replays
    * the exact synchronous update over a label list in a recursive
    * CTE. */
  private val q237 = Q("q237_label_prop",
    (s, dir) => {
      import s.implicits._
      val edges = t(s, dir, "lineitem")
        .select(($"l_partkey" % 211).as("src"), ($"l_suppkey" % 211).as("dst"))
      graft.graph.LabelProp.propagate(edges, "src", "dst", iters = 5)
        .orderBy($"node")
    },
    Some(s"""WITH RECURSIVE
           |e AS (
           |  SELECT DISTINCT least(l_partkey % 211, l_suppkey % 211) AS a,
           |                  greatest(l_partkey % 211, l_suppkey % 211) AS b
           |  FROM lineitem WHERE l_partkey % 211 != l_suppkey % 211),
           |nd AS (
           |  SELECT node, row_number() OVER (ORDER BY node) AS i
           |  FROM (SELECT DISTINCT a AS node FROM e
           |        UNION SELECT b FROM e)),
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
           |                       FROM sym GROUP BY ui) a USING (i))),
           |lbl0 AS (SELECT list(node ORDER BY i) AS x FROM nd),
           |it AS (
           |  SELECT 0 AS iter, lbl0.x AS x FROM lbl0
           |  UNION ALL
           |  SELECT iter + 1,
           |    list_transform(range(1, nn.n + 1), i ->
           |      CASE WHEN len(adjl.adj[i]) = 0 THEN it.x[i]
           |           ELSE $winner END) AS x
           |  FROM it, adjl, nn WHERE it.iter < 5),
           |fin AS (SELECT x FROM it ORDER BY iter DESC LIMIT 1)
           |SELECT nd.node, fin.x[nd.i] AS community
           |FROM nd, fin ORDER BY nd.node""".stripMargin))

  /** X128: seasonal-naive backtest
    * ([[graft.events.Backtest.seasonalNaive]], season = 7) over the
    * exact-2dp daily revenue series per priority. */
  private val q238 = Q("q238_backtest_mape",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "orders")
        .filter($"o_orderdate".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"o_orderpriority",
          date_trunc("day", $"o_orderdate").as("d"))
        .agg((round(sum($"o_totalprice") * 100).cast("long") / 100.0)
          .as("v"))
      graft.events.Backtest
        .seasonalNaive(daily, "o_orderpriority", "d", "v", season = 7)
        .orderBy($"o_orderpriority")
    },
    Some("""WITH daily AS (
           |  SELECT o_orderpriority AS pr, date_trunc('day', o_orderdate) AS d,
           |    round(sum(o_totalprice) * 100)::BIGINT / 100.0 AS v
           |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
           |f AS (
           |  SELECT pr, v,
           |    lag(v, 7) OVER (PARTITION BY pr ORDER BY d) AS fc
           |  FROM daily),
           |sc AS (SELECT pr, v, fc, v - fc AS e FROM f
           |       WHERE fc IS NOT NULL)
           |SELECT pr AS o_orderpriority, count(*)::BIGINT AS n_scored,
           |  round(avg(abs(e)), 4) AS mae,
           |  round(sqrt(avg(e * e)), 4) AS rmse,
           |  round(avg(CASE WHEN v != 0 THEN abs(e) / abs(v) END), 4)
           |    AS mape,
           |  round(avg(CASE WHEN abs(v) + abs(fc) != 0
           |            THEN 2.0 * abs(e) / (abs(v) + abs(fc)) END), 4)
           |    AS smape
           |FROM sc GROUP BY pr ORDER BY o_orderpriority""".stripMargin))

  /** X129: ABC / Pareto classification ([[graft.report.Abc.classify]])
    * of parts by revenue — exact-cents cumulative shares, integer
    * boundary tests (cum·100 ≤ pct·total). */
  private val q239 = Q("q239_abc_classes",
    (s, dir) => {
      import s.implicits._
      val rev = t(s, dir, "lineitem")
        .groupBy($"l_partkey")
        .agg(round(sum($"l_extendedprice") * 100).cast("long").as("cents"))
      graft.report.Abc.classify(rev, "l_partkey", "cents")
        .orderBy($"rank")
    },
    Some("""WITH rev AS (
           |  SELECT l_partkey,
           |    round(sum(l_extendedprice) * 100)::BIGINT AS cents
           |  FROM lineitem GROUP BY 1),
           |r AS (
           |  SELECT l_partkey, cents,
           |    row_number() OVER (ORDER BY cents DESC, l_partkey) AS rank,
           |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           |      AS cum,
           |    sum(cents) OVER ()::BIGINT AS tot
           |  FROM rev)
           |SELECT l_partkey, cents, rank,
           |  round(cum::DOUBLE / tot, 4) AS cum_share,
           |  CASE WHEN cum * 100 <= tot * 80 THEN 'A'
           |       WHEN cum * 100 <= tot * 95 THEN 'B'
           |       ELSE 'C' END AS abc_class
           |FROM r ORDER BY rank""".stripMargin))

  /** X130: log-log price elasticity per brand
    * ([[graft.de.RankStats.groupedOls]] over part-grain ln(quantity) ~
    * ln(unit price) points — cross-part price variation within the
    * brand).
    *
    * Domain contract (fuzz-49): a part cell with non-positive total
    * quantity or revenue has no log-log point — filtered EXPLICITLY
    * on both sides (q > 0 AND revenue > 0 ⟺ q > 0 AND price > 0;
    * null sums fail the predicate too). Spark's non-ANSI `log` nulls
    * the negative domain while DuckDB's `ln` ERRORS — the recurrent
    * divergence class; the v4 Zipf part-key collapse first
    * concentrated enough sign-flipped rows to go negative at this
    * grouping grain. */
  private val q240 = Q("q240_elasticity",
    (s, dir) => {
      import s.implicits._
      val pts = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"l_partkey")
        .agg(sum($"l_quantity").as("q"),
          sum($"l_extendedprice").as("sp"))
        .filter($"q" > 0 && $"sp" > 0)
        .select($"p_brand", log($"q").as("lnq"),
          log($"sp" / $"q").as("lnp"))
      graft.de.RankStats.groupedOls(pts, Seq("p_brand"), "lnq", "lnp")
        .orderBy($"p_brand")
    },
    Some("""WITH pts AS (
           |  SELECT p_brand, l_partkey, ln(sum(l_quantity)) AS lnq,
           |    ln(sum(l_extendedprice) / sum(l_quantity)) AS lnp
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  GROUP BY 1, 2
           |  -- domain contract: positive quantity AND revenue only
           |  HAVING sum(l_quantity) > 0 AND sum(l_extendedprice) > 0)
           |SELECT p_brand, round(regr_slope(lnq, lnp), 4) AS slope,
           |  round(regr_intercept(lnq, lnp), 4) AS intercept,
           |  round(regr_r2(lnq, lnp), 4) AS r2,
           |  regr_count(lnq, lnp)::BIGINT AS n
           |FROM pts GROUP BY p_brand ORDER BY p_brand""".stripMargin))

  val all: Seq[Q] = Seq(q237, q238, q239, q240)
}
