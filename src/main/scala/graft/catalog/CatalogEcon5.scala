package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch J (X90+): count-model
  * diagnostics, dependence-robust FDR, positional/unpivot relational
  * widening, calendar arithmetic. Conventions follow Catalog.scala.
  */
object CatalogEcon5 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X90: overdispersion + negative-binomial moment fit of each event
    * type's daily counts ([[graft.de.CountModels.overdispersion]]) —
    * the Poisson-honesty screen; under-dispersed series yield nulls,
    * not clamped fits. */
  private val q195 = Q("q195_overdispersion",
    (s, dir) => {
      import s.implicits._
      val series = t(s, dir, "events")
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).as("c"))
      graft.de.CountModels.overdispersion(series, "event_type", "c")
        .orderBy($"event_type")
    },
    Some("""WITH s AS (SELECT event_type, ts::DATE AS d,
           |    count(*)::BIGINT AS c
           |  FROM events GROUP BY 1, 2)
           |SELECT event_type, count(*)::BIGINT AS n,
           |  round(avg(c), 4) AS mean,
           |  round(var_samp(c), 4) AS variance,
           |  CASE WHEN avg(c) > 0
           |       THEN round(var_samp(c) / avg(c), 4) END AS dispersion,
           |  CASE WHEN var_samp(c) > avg(c) THEN
           |    round(avg(c) * avg(c) / (var_samp(c) - avg(c)), 4)
           |  END AS nb_r,
           |  CASE WHEN var_samp(c) > avg(c) THEN
           |    round(avg(c) / var_samp(c), 4) END AS nb_p
           |FROM s GROUP BY 1 ORDER BY 1""".stripMargin))

  /** X91: Benjamini–Yekutieli FDR under arbitrary dependence
    * ([[graft.de.Stats.byAdjust]]) — q15's exact-rational pseudo-p
    * battery re-run through the H_m-scaled pipeline; adjusted values
    * rounded to 6 dp because the two engines' harmonic sums differ at
    * ~1e-12 (driver ascending fold vs unordered SQL sum). */
  private val q196 = Q("q196_by_fdr",
    (s, dir) => {
      import s.implicits._
      val p = t(s, dir, "orders")
        .filter($"o_orderkey" % 3 =!= 0)
        .select($"o_orderkey".as("id"),
          (($"o_orderkey" * 9973) % 10007 / lit(10007.0)).as("pvalue"))
      graft.de.Stats.byAdjust(p, "pvalue", "adj", tieBreak = Seq("id"))
        .select($"id", $"pvalue",
          round($"adj", 6).as("adjusted_pvalue"))
        .orderBy($"id")
    },
    Some("""WITH p AS (
           |  SELECT o_orderkey AS id,
           |         ((o_orderkey * 9973) % 10007) / 10007.0 AS pvalue
           |  FROM orders WHERE o_orderkey % 3 != 0),
           |h AS (SELECT sum(1.0 / i) AS hm FROM (
           |        SELECT unnest(generate_series(1,
           |          (SELECT count(*) FROM p))) AS i)),
           |r AS (
           |  SELECT id, pvalue, pvalue * hm AS ps,
           |         row_number() OVER (ORDER BY pvalue, id) AS rk,
           |         CAST(count(*) OVER () AS DOUBLE) AS m
           |  FROM p, h)
           |SELECT id, pvalue,
           |  round(least(1.0, min(ps * m / rk)
           |    OVER (ORDER BY rk DESC ROWS BETWEEN UNBOUNDED PRECEDING
           |          AND CURRENT ROW)), 6) AS adjusted_pvalue
           |FROM r ORDER BY id""".stripMargin))

  /** §2.8 widening: positional explode of sorted struct arrays —
    * posexplode vs the oracle's index-unnest over the same
    * lexicographically-sorted list-of-struct. */
  private val q197 = Q("q197_posexplode",
    (s, dir) => {
      import s.implicits._
      val arr = t(s, dir, "lineitem")
        .filter($"l_orderkey" % 101 === 0)
        .select($"l_orderkey",
          round($"l_extendedprice" * 100).cast("long").as("cents"),
          $"l_linenumber".cast("long").as("ln"))
        // complete-case: engines disagree on where a struct with a
        // null leading field sorts (q194's array-family discipline;
        // fuzz-23 shifted every position after a fuzzed null price)
        .filter($"cents".isNotNull)
        .groupBy($"l_orderkey")
        .agg(array_sort(collect_list(struct($"cents", $"ln"))).as("a"))
      arr.select($"l_orderkey", posexplode($"a"))
        .select($"l_orderkey", $"pos".cast("long").as("pos"),
          $"col.cents".as("cents"), $"col.ln".as("ln"))
        .orderBy($"l_orderkey", $"pos")
    },
    Some("""WITH arr AS (
           |  SELECT l_orderkey,
           |    list_sort(list({'cents':
           |      CAST(round(l_extendedprice * 100) AS BIGINT),
           |      'ln': CAST(l_linenumber AS BIGINT)})) AS a
           |  FROM lineitem WHERE l_orderkey % 101 = 0
           |    AND l_extendedprice IS NOT NULL
           |  GROUP BY 1)
           |SELECT l_orderkey, (i - 1)::BIGINT AS pos,
           |  a[i]['cents'] AS cents, a[i]['ln'] AS ln
           |FROM arr, UNNEST(range(1, len(a) + 1)) AS r(i)
           |ORDER BY l_orderkey, pos""".stripMargin))

  /** §2.4 widening: unpivot/melt — the wide per-flag metric table
    * turned long (Spark's typed unpivot vs DuckDB's UNPIVOT). */
  private val q198 = Q("q198_unpivot",
    (s, dir) => {
      import s.implicits._
      val wide = t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_price"),
          round(avg($"l_discount"), 4).as("avg_disc"))
      wide.unpivot(Array($"l_returnflag"),
          Array($"sum_qty", $"sum_price", $"avg_disc"),
          "metric", "val")
        .orderBy($"l_returnflag", $"metric")
    },
    Some("""WITH wide AS (
           |  SELECT l_returnflag,
           |    round(sum(l_quantity), 2) AS sum_qty,
           |    round(sum(l_extendedprice), 2) AS sum_price,
           |    round(avg(l_discount), 4) AS avg_disc
           |  FROM lineitem GROUP BY 1)
           |SELECT l_returnflag, metric, val
           |FROM wide UNPIVOT (val FOR metric IN
           |  (sum_qty, sum_price, avg_disc))
           |ORDER BY l_returnflag, metric""".stripMargin))

  /** §2.6 widening: business-day calendar arithmetic — next business
    * day after each order date (weekend roll-forward), aggregated to a
    * (priority, gap) matrix. Weekday alignment uses each engine's OWN
    * numbering normalized to Monday=0 (the q135 technique). */
  private val q199 = Q("q199_business_day",
    (s, dir) => {
      import s.implicits._
      // Spark dayofweek: Sunday=1..Saturday=7 → Monday=0 alignment
      val dowM0 = (dayofweek(to_date($"o_orderdate")) + 5) % 7
      val gap = when(dowM0 === 4, 3).when(dowM0 === 5, 2).otherwise(1)
      t(s, dir, "orders")
        .select($"o_orderpriority", gap.cast("long").as("gap_days"))
        .groupBy($"o_orderpriority", $"gap_days")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority", $"gap_days")
    },
    Some("""WITH g AS (
           |  SELECT o_orderpriority,
           |    CASE (dayofweek(o_orderdate::DATE) + 6) % 7
           |      WHEN 4 THEN 3 WHEN 5 THEN 2 ELSE 1
           |    END::BIGINT AS gap_days
           |  FROM orders)
           |SELECT o_orderpriority, gap_days, count(*)::BIGINT AS n_orders
           |FROM g GROUP BY 1, 2
           |ORDER BY o_orderpriority, gap_days""".stripMargin))

  val all: Seq[Q] = Seq(q195, q196, q197, q198, q199)
}
