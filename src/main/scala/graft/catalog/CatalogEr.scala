package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch P (X113+):
  * probabilistic record linkage ([[graft.er.FellegiSunter]]),
  * closed-form multiple regression ([[graft.ml.Regression]]),
  * 3-itemset association rules
  * ([[graft.reco.MarketBasket.tripleRules]]), and tombstone-aware CDC
  * materialization ([[graft.events.Cdc]]).
  */
object CatalogEr {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // Fellegi–Sunter m/u parameters for q223 — the exact double weights
  // are embedded into the oracle SQL as literals (shortest-roundtrip
  // repr), so both engines sum identical constants and the ln-vs-log
  // libm question never arises.
  private val Log2 = math.log(2.0)
  private def aw(m: Double, u: Double) = math.log(m / u) / Log2
  private def dw(m: Double, u: Double) = math.log((1 - m) / (1 - u)) / Log2

  /** X113: Fellegi–Sunter match scoring over nation+segment-blocked
    * customer pairs — three boolean comparison fields (balance within
    * 500, key mod-10 "check digit", balance-sign agreement) weighted
    * by log2 likelihood ratios; top-100 candidate matches. */
  private val q223 = Q("q223_fellegi_sunter",
    (s, dir) => {
      import s.implicits._
      val pairs = graft.er.FellegiSunter.blockedPairs(
        t(s, dir, "customer").select($"c_custkey", $"c_nationkey",
          $"c_mktsegment", $"c_acctbal"),
        "c_custkey", Seq("c_nationkey", "c_mktsegment"))
        .withColumn("bal_close",
          abs($"l_c_acctbal" - $"r_c_acctbal") < 500)
        .withColumn("key_mod",
          $"l_c_custkey" % 10 === $"r_c_custkey" % 10)
        .withColumn("sign_eq",
          ($"l_c_acctbal" >= 0) === ($"r_c_acctbal" >= 0))
      graft.er.FellegiSunter.score(pairs, Map(
          "bal_close" -> ((0.85, 0.10)),
          "key_mod" -> ((0.90, 0.10)),
          "sign_eq" -> ((0.95, 0.50))))
        .select($"l_c_custkey".as("id_a"), $"r_c_custkey".as("id_b"),
          $"fs_score")
        .orderBy($"fs_score".desc, $"id_a", $"id_b")
        .limit(100)
    },
    Some(s"""WITH p AS (
           |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           |    CASE WHEN abs(a.c_acctbal - b.c_acctbal) < 500
           |         THEN ${aw(0.85, 0.10)}::DOUBLE ELSE ${dw(0.85, 0.10)}::DOUBLE END +
           |    CASE WHEN a.c_custkey % 10 = b.c_custkey % 10
           |         THEN ${aw(0.90, 0.10)}::DOUBLE ELSE ${dw(0.90, 0.10)}::DOUBLE END +
           |    CASE WHEN (a.c_acctbal >= 0) = (b.c_acctbal >= 0)
           |         THEN ${aw(0.95, 0.50)}::DOUBLE ELSE ${dw(0.95, 0.50)}::DOUBLE END
           |      AS w
           |  FROM customer a JOIN customer b
           |    ON a.c_nationkey = b.c_nationkey
           |   AND a.c_mktsegment = b.c_mktsegment
           |   AND a.c_custkey < b.c_custkey)
           |SELECT id_a, id_b, round(w, 4) AS fs_score
           |FROM p ORDER BY fs_score DESC, id_a, id_b
           |LIMIT 100""".stripMargin))

  /** X114: two-regressor OLS ([[graft.ml.Regression.ols2]]) — order
    * value on line count and total quantity; ten map-side-combined
    * sufficient statistics, Cramer solve on the single result row. */
  private val q224 = Q("q224_ols2",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").groupBy($"l_orderkey")
        .agg(count(lit(1)).as("x1"), sum($"l_quantity").as("x2"))
      val j = t(s, dir, "orders")
        .join(li, $"o_orderkey" === $"l_orderkey")
      graft.ml.Regression.ols2(j, "o_totalprice", "x1", "x2")
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey, count(*)::DOUBLE AS x1,
           |         sum(l_quantity) AS x2
           |  FROM lineitem GROUP BY 1),
           |j AS (
           |  -- complete-case like the operator (fuzz-18: null y/x2
           |  -- rows counted in the oracle's n but vanished from its
           |  -- sums)
           |  SELECT o_totalprice AS y, x1, x2
           |  FROM orders JOIN li ON o_orderkey = l_orderkey
           |  WHERE o_totalprice IS NOT NULL AND x1 IS NOT NULL
           |    AND x2 IS NOT NULL),
           |a AS (
           |  SELECT count(*)::BIGINT AS n, sum(x1) AS s1, sum(x2) AS s2,
           |    sum(y) AS sy, sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
           |    sum(x1 * x2) AS s12, sum(x1 * y) AS s1y,
           |    sum(x2 * y) AS s2y, sum(y * y) AS syy
           |  FROM j),
           |c AS (
           |  SELECT n, s1, s2, sy,
           |    s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
           |    s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
           |    s2y - s2 * sy / n AS c2y, syy - sy * sy / n AS cyy
           |  FROM a),
           |f AS (
           |  SELECT n, s1, s2, sy, c1y, c2y, cyy,
           |    (c1y * c22 - c2y * c12) / nullif(c11 * c22 - c12 * c12, 0)
           |      AS b1,
           |    (c2y * c11 - c1y * c12) / nullif(c11 * c22 - c12 * c12, 0)
           |      AS b2
           |  FROM c)
           |SELECT n, round((sy - b1 * s1 - b2 * s2) / n, 4) AS b0,
           |  round(b1, 4) AS b1, round(b2, 4) AS b2,
           |  round((b1 * c1y + b2 * c2y) / nullif(cyy, 0), 4) AS r2
           |FROM f""".stripMargin))

  /** X115: frequent 3-itemset rules
    * ([[graft.reco.MarketBasket.tripleRules]]) over order → brand
    * baskets; {a,b}→c confidence against the pair support. */
  private val q225 = Q("q225_assoc3",
    (s, dir) => {
      import s.implicits._
      val j = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .select($"l_orderkey", $"p_brand")
      graft.reco.MarketBasket
        .tripleRules(j, "l_orderkey", "p_brand",
          minItemSupport = 1L, minTripleCount = 5L)
        .orderBy($"triple_count".desc, $"item_a", $"item_b", $"item_c")
        .limit(50)
    },
    Some("""WITH inc AS (
           |  SELECT DISTINCT l_orderkey AS bk, p_brand AS it
           |  FROM lineitem JOIN part ON l_partkey = p_partkey),
           |pairs AS (
           |  SELECT a.bk AS bk, a.it AS ia, b.it AS ib
           |  FROM inc a JOIN inc b ON a.bk = b.bk AND a.it < b.it),
           |pc AS (SELECT ia, ib, count(*)::BIGINT AS pair_ab_count
           |       FROM pairs GROUP BY 1, 2),
           |tri AS (
           |  SELECT p.ia AS ia, p.ib AS ib, c.it AS ic,
           |    count(*)::BIGINT AS triple_count
           |  FROM pairs p JOIN inc c ON p.bk = c.bk AND p.ib < c.it
           |  GROUP BY 1, 2, 3
           |  HAVING count(*) >= 5)
           |SELECT ia AS item_a, ib AS item_b, ic AS item_c,
           |  triple_count, pair_ab_count,
           |  round(triple_count::DOUBLE / pair_ab_count, 4) AS confidence
           |FROM tri JOIN pc USING (ia, ib)
           |ORDER BY triple_count DESC, item_a, item_b, item_c
           |LIMIT 50""".stripMargin))

  /** X116: tombstone-aware CDC materialization
    * ([[graft.events.Cdc.applyLog]]) — events as an I/U/D log keyed by
    * user; users whose last entry is a delete vanish from the state. */
  private val q226 = Q("q226_cdc_apply",
    (s, dir) => {
      import s.implicits._
      val log = t(s, dir, "events")
        .withColumn("op",
          when($"event_type" === "signup", "I")
            .when($"event_type" === "error", "D")
            .otherwise("U"))
      graft.events.Cdc
        .applyLog(log, "user_id", "ts", "event_id", "op",
          Seq("value"), deleteOp = "D")
        .select($"user_id", round($"value", 4).as("last_value"),
          $"n_ops", $"last_ts")
        .orderBy($"user_id")
    },
    Some("""WITH log AS (
           |  SELECT user_id, ts, event_id, value,
           |    CASE WHEN event_type = 'signup' THEN 'I'
           |         WHEN event_type = 'error' THEN 'D'
           |         ELSE 'U' END AS op
           |  FROM events),
           |r AS (
           |  SELECT *,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY ts DESC, event_id DESC) AS rn,
           |    count(*) OVER (PARTITION BY user_id) AS nops
           |  FROM log)
           |SELECT user_id, round(value, 4) AS last_value,
           |  nops::BIGINT AS n_ops, ts AS last_ts
           |FROM r WHERE rn = 1 AND op != 'D'
           |ORDER BY user_id""".stripMargin))

  val all: Seq[Q] = Seq(q223, q224, q225, q226)
}
