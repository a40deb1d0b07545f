package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch EE (X171+): exact
  * Shapley channel attribution and the joinability (data-discovery)
  * index.
  */
object CatalogAttr {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X171: exact three-channel Shapley attribution
    * ([[graft.events.Shapley.threeChannel]]) — click/view/signup
    * touches, purchase conversions; coalition rates from exact integer
    * counts, closed-form n = 3 weights. */
  private val q280 = Q("q280_shapley",
    (s, dir) => {
      graft.events.Shapley.threeChannel(t(s, dir, "events"),
        "user_id", "event_type", Seq("click", "view", "signup"),
        "purchase")
    },
    Some("""WITH pu AS (
           |  SELECT user_id,
           |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           |      AS h1,
           |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           |      AS h2,
           |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           |      AS h3,
           |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS cv
           |  FROM events GROUP BY 1),
           |coal AS (
           |  SELECT h1, h2, h3, count(*)::BIGINT AS n,
           |    sum(cv)::BIGINT AS k
           |  FROM pu GROUP BY 1, 2, 3),
           |wide AS (
           |  SELECT
           |    coalesce(max(CASE WHEN h1=0 AND h2=0 AND h3=0
           |      THEN k::DOUBLE / n END), 0.0) AS v000,
           |    coalesce(max(CASE WHEN h1=1 AND h2=0 AND h3=0
           |      THEN k::DOUBLE / n END), 0.0) AS v100,
           |    coalesce(max(CASE WHEN h1=0 AND h2=1 AND h3=0
           |      THEN k::DOUBLE / n END), 0.0) AS v010,
           |    coalesce(max(CASE WHEN h1=0 AND h2=0 AND h3=1
           |      THEN k::DOUBLE / n END), 0.0) AS v001,
           |    coalesce(max(CASE WHEN h1=1 AND h2=1 AND h3=0
           |      THEN k::DOUBLE / n END), 0.0) AS v110,
           |    coalesce(max(CASE WHEN h1=1 AND h2=0 AND h3=1
           |      THEN k::DOUBLE / n END), 0.0) AS v101,
           |    coalesce(max(CASE WHEN h1=0 AND h2=1 AND h3=1
           |      THEN k::DOUBLE / n END), 0.0) AS v011,
           |    coalesce(max(CASE WHEN h1=1 AND h2=1 AND h3=1
           |      THEN k::DOUBLE / n END), 0.0) AS v111,
           |    sum(k)::DOUBLE / sum(n) AS grand
           |  FROM coal)
           |SELECT ch.channel,
           |  round(CASE ch.channel
           |    WHEN 'click' THEN
           |      (1.0/3)*(v100-v000) + (1.0/6)*(v110-v010)
           |      + (1.0/6)*(v101-v001) + (1.0/3)*(v111-v011)
           |    WHEN 'view' THEN
           |      (1.0/3)*(v010-v000) + (1.0/6)*(v110-v100)
           |      + (1.0/6)*(v011-v001) + (1.0/3)*(v111-v101)
           |    ELSE
           |      (1.0/3)*(v001-v000) + (1.0/6)*(v101-v100)
           |      + (1.0/6)*(v011-v010) + (1.0/3)*(v111-v110)
           |    END, 6) AS shapley,
           |  round(grand, 6) AS overall_rate
           |FROM (VALUES ('click'), ('view'), ('signup')) AS ch(channel),
           |  wide
           |ORDER BY ch.channel""".stripMargin))

  /** X172: joinability index — distinct-value containment
    * |A∩B|/min(|A|,|B|) between candidate key-column pairs (the
    * Aurum-style data-discovery score that says "these two columns
    * join"). Distinct sets aggregated once per column; intersection
    * via one equi-join per pair. */
  private val q281 = Q("q281_joinability",
    (s, dir) => {
      import s.implicits._
      def cols(tab: String, c: String) =
        t(s, dir, tab).select(col(c).cast("long").as("v")).distinct()
      def pair(name: String, a: DataFrame, b: DataFrame) = {
        val na = a.count(); val nb = b.count()
        val ni = a.join(b, Seq("v")).count()
        (name, na, nb, ni,
          BigDecimal(ni.toDouble / math.min(na, nb))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val rows = Seq(
        pair("o_custkey~c_custkey", cols("orders", "o_custkey"),
          cols("customer", "c_custkey")),
        pair("l_partkey~p_partkey", cols("lineitem", "l_partkey"),
          cols("part", "p_partkey")),
        pair("l_suppkey~s_suppkey", cols("lineitem", "l_suppkey"),
          cols("supplier", "s_suppkey")),
        pair("o_custkey~s_suppkey", cols("orders", "o_custkey"),
          cols("supplier", "s_suppkey")))
      rows.toDF("pair", "n_a", "n_b", "n_common", "containment")
        .orderBy($"pair")
    },
    Some("""WITH p1 AS (
           |  SELECT 'o_custkey~c_custkey' AS pair,
           |    (SELECT count(DISTINCT o_custkey) FROM orders)::BIGINT
           |      AS n_a,
           |    (SELECT count(DISTINCT c_custkey) FROM customer)::BIGINT
           |      AS n_b,
           |    (SELECT count(*) FROM
           |      (SELECT DISTINCT o_custkey FROM orders) a
           |      JOIN (SELECT DISTINCT c_custkey FROM customer) b
           |        ON a.o_custkey = b.c_custkey)::BIGINT AS n_common),
           |p2 AS (
           |  SELECT 'l_partkey~p_partkey',
           |    (SELECT count(DISTINCT l_partkey) FROM lineitem)::BIGINT,
           |    (SELECT count(DISTINCT p_partkey) FROM part)::BIGINT,
           |    (SELECT count(*) FROM
           |      (SELECT DISTINCT l_partkey FROM lineitem) a
           |      JOIN (SELECT DISTINCT p_partkey FROM part) b
           |        ON a.l_partkey = b.p_partkey)::BIGINT),
           |p3 AS (
           |  SELECT 'l_suppkey~s_suppkey',
           |    (SELECT count(DISTINCT l_suppkey) FROM lineitem)::BIGINT,
           |    (SELECT count(DISTINCT s_suppkey) FROM supplier)::BIGINT,
           |    (SELECT count(*) FROM
           |      (SELECT DISTINCT l_suppkey FROM lineitem) a
           |      JOIN (SELECT DISTINCT s_suppkey FROM supplier) b
           |        ON a.l_suppkey = b.s_suppkey)::BIGINT),
           |p4 AS (
           |  SELECT 'o_custkey~s_suppkey',
           |    (SELECT count(DISTINCT o_custkey) FROM orders)::BIGINT,
           |    (SELECT count(DISTINCT s_suppkey) FROM supplier)::BIGINT,
           |    (SELECT count(*) FROM
           |      (SELECT DISTINCT o_custkey FROM orders) a
           |      JOIN (SELECT DISTINCT s_suppkey FROM supplier) b
           |        ON a.o_custkey = b.s_suppkey)::BIGINT),
           |u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
           |      UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4)
           |SELECT pair, n_a, n_b, n_common,
           |  round(n_common::DOUBLE / least(n_a, n_b), 4) AS containment
           |FROM u ORDER BY pair""".stripMargin))

  val all: Seq[Q] = Seq(q280, q281)
}
