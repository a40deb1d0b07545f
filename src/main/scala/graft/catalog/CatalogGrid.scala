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
    * from the UTC-pinned session. Share is per-cell of total (4dp). */
  private val q282 = Q("q282_dow_hour_heatmap",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "events")
        .groupBy((pmod(dayofweek($"ts") + 5, lit(7)) + 1).cast("int")
          .as("dow"), hour($"ts").as("hr"))
        .agg(count(lit(1)).as("n_events"),
          round(sum($"value"), 2).as("sum_value"))
        .withColumn("share", round($"n_events" /
          sum($"n_events").over(Window.partitionBy(lit(1)))
            .cast("double"), 4))
        .orderBy($"dow", $"hr")
    },
    Some("""SELECT isodow(ts)::INT AS dow, hour(ts)::INT AS hr,
           |  count(*)::BIGINT AS n_events,
           |  round(sum(value), 2) AS sum_value,
           |  round(count(*) / (SELECT count(*) FROM events)::DOUBLE, 4)
           |    AS share
           |FROM events GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin))

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
