package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch O (X109+): financial
  * time-series kernels ([[graft.events.Finance]]) and the
  * difference-in-differences readout
  * ([[graft.de.Experiment.didEstimate]]). Equity/flow math runs in
  * exact integer cents (`round(sum(x)*100)::long`, the q210
  * convention) so cumulative sums, running peaks, and the drawdown
  * argmax are bit-identical across engines.
  */
object CatalogFin {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X109: maximum drawdown ([[graft.events.Finance.maxDrawdown]]) of
    * each priority class's daily net-flow equity curve (open orders
    * credit, fulfilled/pending debit — a signed series with real
    * troughs). Exact cents end to end; trough day is the earliest
    * argmax by construction. */
  private val q219 = Q("q219_max_drawdown",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "orders")
        .filter($"o_orderdate".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"o_orderpriority",
          date_trunc("day", $"o_orderdate").as("d"))
        .agg(round(sum(when($"o_orderstatus" === "O", $"o_totalprice")
            .otherwise(-$"o_totalprice")) * 100).cast("long").as("flow"))
      graft.events.Finance.maxDrawdown(daily, "o_orderpriority", "d", "flow")
        .withColumnRenamed("trough", "trough_day")
        .orderBy($"o_orderpriority")
    },
    Some("""WITH daily AS (
           |  SELECT o_orderpriority AS pr, date_trunc('day', o_orderdate) AS d,
           |    round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice
           |                   ELSE -o_totalprice END) * 100)::BIGINT AS flow
           |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
           |eq AS (
           |  SELECT pr, d, sum(flow) OVER (PARTITION BY pr ORDER BY d
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS eq
           |  FROM daily),
           |pk AS (
           |  SELECT pr, d, eq, max(eq) OVER (PARTITION BY pr ORDER BY d
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
           |  FROM eq),
           |dd AS (
           |  SELECT pr, d, eq, peak, peak - eq AS dd,
           |    row_number() OVER (PARTITION BY pr ORDER BY peak - eq DESC, d)
           |      AS rn,
           |    row_number() OVER (PARTITION BY pr ORDER BY d DESC) AS rnl
           |  FROM pk)
           |SELECT pr AS o_orderpriority, count(*)::BIGINT AS n_buckets,
           |  max(CASE WHEN rnl = 1 THEN eq END)::BIGINT AS final_equity,
           |  max(peak)::BIGINT AS peak_equity,
           |  max(CASE WHEN rn = 1 THEN dd END)::BIGINT AS max_drawdown,
           |  max(CASE WHEN rn = 1 THEN d END)::TIMESTAMP AS trough_day
           |FROM dd GROUP BY pr ORDER BY o_orderpriority""".stripMargin))

  /** X110: Bollinger breakout summary
    * ([[graft.events.Finance.bollinger]], width 10, k = 2) over daily
    * revenue per priority. Daily values snap to exact 2-dp dollars
    * (cents/100.0) before the rolling windows, so both engines window
    * identical doubles; incomplete leading windows are excluded by the
    * roll_n = width guard on both sides. */
  private val q220 = Q("q220_bollinger",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "orders")
        .filter($"o_orderdate".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"o_orderpriority",
          date_trunc("day", $"o_orderdate").as("d"))
        .agg((round(sum($"o_totalprice") * 100).cast("long") / 100.0)
          .as("v"))
      graft.events.Finance
        .bollinger(daily, "o_orderpriority", "d", "v", width = 10, k = 2.0)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_days"),
          sum(when($"break_up", 1L).otherwise(0L)).as("n_break_up"),
          sum(when($"break_down", 1L).otherwise(0L)).as("n_break_down"))
        .orderBy($"o_orderpriority")
    },
    Some("""WITH daily AS (
           |  SELECT o_orderpriority AS pr, date_trunc('day', o_orderdate) AS d,
           |    round(sum(o_totalprice) * 100)::BIGINT / 100.0 AS v
           |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
           |roll AS (
           |  SELECT pr, d, v,
           |    avg(v) OVER w AS m, stddev_samp(v) OVER w AS sd,
           |    count(*) OVER w AS n
           |  FROM daily
           |  WINDOW w AS (PARTITION BY pr ORDER BY d
           |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
           |SELECT pr AS o_orderpriority, count(*)::BIGINT AS n_days,
           |  sum(CASE WHEN n = 10 AND v > m + 2 * sd THEN 1 ELSE 0 END)::BIGINT
           |    AS n_break_up,
           |  sum(CASE WHEN n = 10 AND v < m - 2 * sd THEN 1 ELSE 0 END)::BIGINT
           |    AS n_break_down
           |FROM roll GROUP BY pr ORDER BY o_orderpriority""".stripMargin))

  /** X111: OHLC + VWAP bar assembly ([[graft.events.Finance.ohlcVwap]])
    * — daily bars per event type; price = event value, quantity = the
    * deterministic event_id % 7 + 1 lot size; open/close picked by
    * exact (ts, event_id) order via row_number on both engines. */
  private val q221 = Q("q221_ohlc_vwap",
    (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .withColumn("qty", $"event_id" % 7 + 1)
      graft.events.Finance
        .ohlcVwap(e, "event_type", "ts", "event_id", "value", "qty")
        .select($"event_type", $"bar_ts",
          round($"open", 4).as("open"), round($"high", 4).as("high"),
          round($"low", 4).as("low"), round($"close", 4).as("close"),
          // vwap arrives pre-snapped from the operator (q94 discipline,
          // fuzz-41) — no further round, the double is engine-identical
          $"volume", $"vwap", $"n_trades")
        .orderBy($"event_type", $"bar_ts")
    },
    Some("""WITH e AS (
           |  SELECT event_type, ts, event_id, value,
           |    (event_id % 7 + 1)::BIGINT AS qty,
           |    date_trunc('day', ts)::TIMESTAMP AS bar_ts
           |  FROM events),
           |r AS (
           |  SELECT *,
           |    row_number() OVER (PARTITION BY event_type, bar_ts
           |      ORDER BY ts, event_id) AS rna,
           |    row_number() OVER (PARTITION BY event_type, bar_ts
           |      ORDER BY ts DESC, event_id DESC) AS rnd
           |  FROM e)
           |SELECT event_type, bar_ts,
           |  round(max(CASE WHEN rna = 1 THEN value END), 4) AS open,
           |  round(max(value), 4) AS high,
           |  round(min(value), 4) AS low,
           |  round(max(CASE WHEN rnd = 1 THEN value END), 4) AS close,
           |  sum(qty)::BIGINT AS volume,
           |  round(sum(value * qty) * 10000) / (10000 * sum(qty)) AS vwap,
           |  count(*)::BIGINT AS n_trades
           |FROM r GROUP BY 1, 2
           |ORDER BY event_type, bar_ts""".stripMargin))

  /** X112: difference-in-differences
    * ([[graft.de.Experiment.didEstimate]]) — treated = automobile/
    * machinery customers, post = orders from 1998 on; broadcast
    * dimension join then one conditional aggregate. */
  private val q222 = Q("q222_did",
    (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          $"o_custkey" === $"c_custkey")
        .withColumn("treated",
          $"c_mktsegment".isin("AUTOMOBILE", "MACHINERY"))
        .withColumn("post",
          $"o_orderdate" >= lit("1998-01-01").cast("timestamp"))
      graft.de.Experiment.didEstimate(o, "treated", "post", "o_totalprice")
    },
    Some("""WITH j AS (
           |  SELECT o_totalprice AS v,
           |    c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') AS tr,
           |    o_orderdate >= TIMESTAMP '1998-01-01' AS po
           |  FROM orders JOIN customer ON o_custkey = c_custkey),
           |a AS (
           |  SELECT count(*)::BIGINT AS n,
           |    sum(CASE WHEN tr THEN 1 ELSE 0 END)::BIGINT AS n_treated,
           |    avg(CASE WHEN tr AND NOT po THEN v END) AS tp0,
           |    avg(CASE WHEN tr AND po THEN v END) AS tp1,
           |    avg(CASE WHEN NOT tr AND NOT po THEN v END) AS cp0,
           |    avg(CASE WHEN NOT tr AND po THEN v END) AS cp1
           |  FROM j)
           |SELECT n, n_treated,
           |  round(tp0, 4) AS mean_t_pre, round(tp1, 4) AS mean_t_post,
           |  round(cp0, 4) AS mean_c_pre, round(cp1, 4) AS mean_c_post,
           |  round((tp1 - tp0) - (cp1 - cp0), 4) AS did_estimate
           |FROM a""".stripMargin))

  val all: Seq[Q] = Seq(q219, q220, q221, q222)
}
