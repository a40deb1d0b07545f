package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch DD (X168+):
  * multi-label set evaluation, calendar-gap freshness audit, and
  * leakage-safe point-in-time label construction.
  */
object CatalogMisc3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X168: multi-label micro/macro F1 — "predict next year's brand
    * basket": 1995 purchases as the predicted set, 1996 as truth, per
    * customer present in both years. Micro aggregates exact integer
    * set sizes; macro averages per-customer F1. One brand-grain join,
    * no array materialization. */
  private val q277 = Q("q277_multilabel_f1",
    (s, dir) => {
      import s.implicits._
      def yr(y: Int) = t(s, dir, "orders")
        .filter(year($"o_orderdate") === y)
        .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .select($"o_custkey", $"p_brand").distinct()
      val pred = yr(1995)
      val truth = yr(1996)
      val both = pred.select($"o_custkey").distinct()
        .join(truth.select($"o_custkey").distinct(), Seq("o_custkey"))
      val p = pred.join(both, Seq("o_custkey"))
      val tr = truth.join(both, Seq("o_custkey"))
      val inter = p.join(tr, Seq("o_custkey", "p_brand"))
        .groupBy($"o_custkey").agg(count(lit(1)).as("ni"))
      val stats = both
        .join(p.groupBy($"o_custkey").agg(count(lit(1)).as("np")),
          Seq("o_custkey"))
        .join(tr.groupBy($"o_custkey").agg(count(lit(1)).as("nt")),
          Seq("o_custkey"))
        .join(inter, Seq("o_custkey"), "left")
        .select($"o_custkey", $"np", $"nt",
          coalesce($"ni", lit(0L)).as("ni"))
      val f1 = $"ni" * 2.0 / ($"np" + $"nt")
      stats.agg(
        count(lit(1)).as("n_customers"),
        sum($"ni").as("sum_inter"),
        sum($"np").as("sum_pred"),
        sum($"nt").as("sum_true"),
        round(sum($"ni") / sum($"np").cast("double"), 4)
          .as("micro_precision"),
        round(sum($"ni") / sum($"nt").cast("double"), 4)
          .as("micro_recall"),
        round(sum($"ni") * 2.0 / (sum($"np") + sum($"nt")), 4)
          .as("micro_f1"),
        // q94 snap-divide (fuzz-44's q202 class, applied to the same
        // statistic here): per-customer f1 quantizes to the 4-dp grid,
        // the sum snaps to exact integer ten-thousandths, one exact
        // division, no final round
        (round(sum(round(f1, 4)) * 1e4) /
          (lit(1e4) * count(lit(1)))).as("macro_f1"))
    },
    Some("""WITH pred AS (
           |  SELECT DISTINCT o_custkey, p_brand
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |  JOIN part ON l_partkey = p_partkey
           |  WHERE year(o_orderdate) = 1995),
           |tr AS (
           |  SELECT DISTINCT o_custkey, p_brand
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |  JOIN part ON l_partkey = p_partkey
           |  WHERE year(o_orderdate) = 1996),
           |bc AS (
           |  SELECT o_custkey FROM (SELECT DISTINCT o_custkey FROM pred)
           |  INTERSECT
           |  SELECT o_custkey FROM (SELECT DISTINCT o_custkey FROM tr)),
           |st AS (
           |  SELECT b.o_custkey,
           |    (SELECT count(*) FROM pred p
           |     WHERE p.o_custkey = b.o_custkey)::BIGINT AS np,
           |    (SELECT count(*) FROM tr t
           |     WHERE t.o_custkey = b.o_custkey)::BIGINT AS nt,
           |    (SELECT count(*) FROM pred p JOIN tr t
           |      ON p.p_brand = t.p_brand AND t.o_custkey = p.o_custkey
           |     WHERE p.o_custkey = b.o_custkey)::BIGINT AS ni
           |  FROM bc b)
           |SELECT count(*)::BIGINT AS n_customers,
           |  sum(ni)::BIGINT AS sum_inter, sum(np)::BIGINT AS sum_pred,
           |  sum(nt)::BIGINT AS sum_true,
           |  round(sum(ni) / sum(np)::DOUBLE, 4) AS micro_precision,
           |  round(sum(ni) / sum(nt)::DOUBLE, 4) AS micro_recall,
           |  round(sum(ni) * 2.0 / (sum(np) + sum(nt)), 4) AS micro_f1,
           |  round(sum(round(ni * 2.0 / (np + nt), 4)) * 1e4)
           |    / (1e4 * count(*)) AS macro_f1
           |FROM st""".stripMargin))

  /** X169: calendar-gap freshness audit — days in each priority's
    * [min, max] span with NO orders, found by anti-joining the dense
    * day grid (sequence/generate_series on both engines); the
    * missing-partition detector every ingestion SLA dashboard needs. */
  private val q278 = Q("q278_calendar_gaps",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "orders")
        .select($"o_orderpriority".as("pr"),
          to_date($"o_orderdate").as("d")).distinct()
      val span = daily.groupBy($"pr")
        .agg(min($"d").as("lo"), max($"d").as("hi"))
      val grid = span.select($"pr",
        explode(sequence($"lo", $"hi")).as("d"))
      grid.join(daily, Seq("pr", "d"), "left_anti")
        .groupBy($"pr".as("o_orderpriority"))
        .agg(count(lit(1)).as("n_missing_days"),
          min($"d").as("first_gap"),
          max($"d").as("last_gap"))
        .orderBy($"o_orderpriority")
    },
    Some("""WITH daily AS (
           |  SELECT DISTINCT o_orderpriority AS pr,
           |    o_orderdate::DATE AS d
           |  FROM orders),
           |span AS (SELECT pr, min(d) AS lo, max(d) AS hi
           |         FROM daily GROUP BY 1),
           |grid AS (
           |  SELECT pr, unnest(generate_series(lo, hi,
           |    INTERVAL 1 DAY))::DATE AS d
           |  FROM span),
           |miss AS (
           |  SELECT g.pr, g.d FROM grid g
           |  LEFT JOIN daily x ON x.pr = g.pr AND x.d = g.d
           |  WHERE x.d IS NULL)
           |SELECT pr AS o_orderpriority,
           |  count(*)::BIGINT AS n_missing_days,
           |  min(d) AS first_gap, max(d) AS last_gap
           |FROM miss GROUP BY pr ORDER BY o_orderpriority""".stripMargin))

  /** X170: leakage-safe point-in-time label assembly — features
    * strictly BEFORE the 1999-01-01 cutoff (count, exact-cents spend,
    * recency), churn label strictly AFTER (no order in the following
    * 180 days); the temporal-split discipline that keeps training
    * frames honest. Summary readout per label so the catalog row count
    * is stable. */
  private val q279 = Q("q279_pit_labels",
    (s, dir) => {
      import s.implicits._
      val cutoff = lit("1999-01-01").cast("timestamp")
      val horizon = lit("1999-06-30").cast("timestamp")
      val pre = t(s, dir, "orders").filter($"o_orderdate" < cutoff)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice") * 100).cast("long").as("cents"),
          datediff(cutoff, max($"o_orderdate")).cast("long")
            .as("recency_days"))
      val post = t(s, dir, "orders")
        .filter($"o_orderdate" >= cutoff && $"o_orderdate" <= horizon)
        .select($"o_custkey").distinct().withColumn("active", lit(1))
      pre.join(post, Seq("o_custkey"), "left")
        .withColumn("churned", $"active".isNull)
        .groupBy($"churned")
        .agg(count(lit(1)).as("n_customers"),
          round(avg($"n_orders"), 4).as("avg_orders"),
          round(avg($"cents") / 100.0, 2).as("avg_spend"),
          round(avg($"recency_days"), 4).as("avg_recency"))
        .orderBy($"churned")
    },
    Some("""WITH pre AS (
           |  SELECT o_custkey, count(*)::BIGINT AS n_orders,
           |    round(sum(o_totalprice) * 100)::BIGINT AS cents,
           |    datediff('day', max(o_orderdate),
           |      TIMESTAMP '1999-01-01')::BIGINT AS recency_days
           |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
           |  GROUP BY 1),
           |post AS (
           |  SELECT DISTINCT o_custkey FROM orders
           |  WHERE o_orderdate >= TIMESTAMP '1999-01-01'
           |    AND o_orderdate <= TIMESTAMP '1999-06-30'),
           |lab AS (
           |  SELECT pre.*, post.o_custkey IS NULL AS churned
           |  FROM pre LEFT JOIN post
           |    ON pre.o_custkey = post.o_custkey)
           |SELECT churned, count(*)::BIGINT AS n_customers,
           |  round(avg(n_orders), 4) AS avg_orders,
           |  round(avg(cents) / 100.0, 2) AS avg_spend,
           |  round(avg(recency_days), 4) AS avg_recency
           |FROM lab GROUP BY churned ORDER BY churned""".stripMargin))

  val all: Seq[Q] = Seq(q277, q278, q279)
}
