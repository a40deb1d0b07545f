package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch FF (X173+): the
  * weekday×hour activity heatmap grid and a log-scale value
  * histogram — two dashboard staples with exact integer axes.
  */
object CatalogGrid {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X173: weekday × hour activity heatmap — the load-pattern grid
    * behind every ops dashboard; ISO weekday alignment as q259, hour
    * from the UTC-pinned session. Share is per-cell of total (4dp).
    *
    * Round-15 exact-accumulation discipline, caught by the EXPANDED
    * 54-query skew oracle on the first full run: the hot cell's
    * share 5650/1e6 sits exactly on the .xxxx5 boundary (Spark's
    * BigDecimal-repr HALF_UP said 0.0057, DuckDB's double said
    * 0.0056), and sum_value = round(sum(4-dp grid), 2) is the same
    * GRID-COARSE shape the q1 money sums had. share is now integer
    * half-up over the exact (n_events, total) pair; sum_value
    * accumulates in DECIMAL. Oracle mirrors both. */
  private val q282 = Q("q282_dow_hour_heatmap",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "events")
        .groupBy((pmod(dayofweek($"ts") + 5, lit(7)) + 1).cast("int")
          .as("dow"), hour($"ts").as("hr"))
        .agg(count(lit(1)).as("n_events"),
          round(sum($"value".cast("decimal(28,4)")), 2)
            .cast("double").as("sum_value"))
        .withColumn("__tot",
          sum($"n_events").over(Window.partitionBy(lit(1))))
        .withColumn("share",
          expr("(2*n_events*10000 + __tot) div (2*__tot)") / 1e4)
        .drop("__tot")
        .orderBy($"dow", $"hr")
    },
    Some("""WITH g AS (
           |  SELECT isodow(ts)::INT AS dow, hour(ts)::INT AS hr,
           |    count(*)::BIGINT AS n_events,
           |    round(sum(value::DECIMAL(28,4)), 2)::DOUBLE AS sum_value
           |  FROM events GROUP BY 1, 2),
           |t AS (SELECT sum(n_events)::BIGINT AS tot FROM g)
           |SELECT dow, hr, n_events, sum_value,
           |  ((2*n_events*10000 + tot) // (2*tot)) / 1e4 AS share
           |FROM g, t ORDER BY dow, hr""".stripMargin))

  /** X174: log₂-scale value histogram — bucket = floor(log2(cents)),
    * an exact INTEGER axis (bit length of the integer cents), so bin
    * membership can never flap across engines; the right shape for
    * heavy-tailed money/size distributions where q131's equi-width
    * bins collapse. */
  private val q283 = Q("q283_log_histogram",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cents = round($"o_totalprice" * 100).cast("long")
      // non-positive/null amounts have no place on a log axis and
      // are dropped on BOTH sides (fuzz-15: Spark lumped them into a
      // null bucket whose WINDOW SORT position differs across
      // engines, and DuckDB's log2(0) errors outright)
      t(s, dir, "orders")
        // the raw-column form pushes to the scan; the exact
        // cents-grain cut (c > 0 ⇔ price ≥ 0.005) still runs on the
        // computed column for the sub-cent edge
        .filter($"o_totalprice" > 0)
        .select(cents.as("c"))
        .filter($"c" > 0)
        .select(floor(log2($"c")).cast("long").as("bucket"), $"c")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          (min($"c") / 100.0).as("min_value"),
          (max($"c") / 100.0).as("max_value"))
        .withColumn("cum_n", sum($"n").over(
          Window.orderBy($"bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
        .orderBy($"bucket")
    },
    Some("""WITH v AS (
           |  SELECT round(o_totalprice * 100)::BIGINT AS c FROM orders
           |  WHERE round(o_totalprice * 100) > 0),
           |b AS (
           |  SELECT floor(log2(c))::BIGINT AS bucket, c FROM v),
           |g AS (
           |  SELECT bucket, count(*)::BIGINT AS n,
           |    min(c) / 100.0 AS min_value, max(c) / 100.0 AS max_value
           |  FROM b GROUP BY 1)
           |SELECT bucket, n, min_value, max_value,
           |  sum(n) OVER (ORDER BY bucket
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           |    AS cum_n
           |FROM g ORDER BY bucket""".stripMargin))

  val all: Seq[Q] = Seq(q282, q283)
}
