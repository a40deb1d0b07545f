package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch CC (X165+):
  * length-distribution drift (source vs corpus JSD), windowed peak
  * detection, and weighted effective sample size.
  */
object CatalogMisc2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X165: length-distribution drift — per source, the Jensen–Shannon
    * divergence between its doc-length-bucket distribution and the
    * corpus's (the "this source is all tweets / all books" gate that
    * token-level KL misses). Buckets are exact integer floor(n_tok/32);
    * the JSD sums run over the bucket-bounded joint table. */
  private val q274 = Q("q274_length_jsd",
    (s, dir) => {
      import s.implicits._
      import graft.text.TextAnalysis.tokenCount
      val b = t(s, dir, "documents")
        .select($"source", (tokenCount($"text") / 32).cast("long").as("bk"))
      val src = b.groupBy($"source", $"bk").agg(count(lit(1)).as("ns"))
      val tot = b.groupBy($"bk").agg(count(lit(1)).as("nt"))
      val sTot = src.groupBy($"source").agg(sum($"ns").as("nsrc"))
      val all = b.agg(count(lit(1)).as("nall"))
      // expand to the (source × corpus-bucket) grid so buckets the
      // source never hits still contribute their q-side JSD mass
      // (every source bucket is a corpus bucket by construction)
      val sources = src.select($"source").distinct()
      val grid = sources.crossJoin(tot)
      val full = grid.join(src, Seq("source", "bk"), "left")
        .select($"source", $"bk", coalesce($"ns", lit(0L)).as("ns"),
          $"nt")
      val withP = full.join(broadcast(sTot), Seq("source"))
        .crossJoin(broadcast(all))
        .select($"source",
          ($"ns".cast("double") / $"nsrc").as("p"),
          ($"nt".cast("double") / $"nall").as("q"))
      val term = (c: org.apache.spark.sql.Column,
                  o: org.apache.spark.sql.Column) =>
        when(c > 0, c * log(lit(2.0) * c / (c + o))).otherwise(0.0)
      withP.groupBy($"source")
        .agg((sum(term($"p", $"q")) + sum(term($"q", $"p"))).as("__raw"))
        // normalized from the RAW sum — dividing the already-rounded
        // jsd would shift half-ulp boundary cases vs the oracle
        .select($"source", round($"__raw" / 2.0, 6).as("jsd"),
          round($"__raw" / 2.0 / math.log(2.0), 6).as("jsd_normalized"))
        .orderBy($"source")
    },
    Some("""WITH b AS (
           |  SELECT source,
           |    (len(regexp_extract_all(text, '\S+')) // 32)::BIGINT AS bk
           |  FROM documents),
           |src AS (SELECT source, bk, count(*)::BIGINT AS ns
           |        FROM b GROUP BY 1, 2),
           |tot AS (SELECT bk, count(*)::BIGINT AS nt FROM b GROUP BY 1),
           |stot AS (SELECT source, sum(ns)::BIGINT AS nsrc
           |         FROM src GROUP BY 1),
           |al AS (SELECT count(*)::BIGINT AS nall FROM b),
           |srcs AS (SELECT DISTINCT source FROM src),
           |grid AS (SELECT s.source, t.bk, t.nt FROM srcs s, tot t),
           |f AS (
           |  SELECT g.source, g.bk, coalesce(src.ns, 0) AS ns, g.nt
           |  FROM grid g LEFT JOIN src
           |    ON src.source = g.source AND src.bk = g.bk),
           |wp AS (
           |  SELECT f.source, ns::DOUBLE / nsrc AS p,
           |    nt::DOUBLE / nall AS q
           |  FROM f JOIN stot ON stot.source = f.source, al),
           |jt AS (
           |  SELECT source,
           |    sum(CASE WHEN p > 0 THEN p * ln(2.0 * p / (p + q))
           |        ELSE 0.0 END) AS tp,
           |    sum(CASE WHEN q > 0 THEN q * ln(2.0 * q / (q + p))
           |        ELSE 0.0 END) AS tq
           |  FROM wp GROUP BY 1)
           |SELECT source, round((tp + tq) / 2.0, 6) AS jsd,
           |  round((tp + tq) / 2.0 / ln(2.0), 6) AS jsd_normalized
           |FROM jt ORDER BY source""".stripMargin))

  /** X166: windowed peak detection — days whose revenue exceeds both
    * neighbors by a relative prominence threshold (lag/lead windows on
    * the exact-cents series; interior days only). Output per priority:
    * peak count and the max-peak day/value. */
  private val q275 = Q("q275_peaks",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"pr").orderBy($"d")
      val daily = t(s, dir, "orders")
        .filter($"o_orderdate".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"o_orderpriority".as("pr"),
          date_trunc("day", $"o_orderdate").as("d"))
        .agg(round(sum($"o_totalprice") * 100).cast("long").as("c"))
        .withColumn("pv", lag($"c", 1).over(w))
        .withColumn("nx", lead($"c", 1).over(w))
      val isPeak = $"pv".isNotNull && $"nx".isNotNull &&
        $"c" > $"pv" * 1.1 && $"c" > $"nx" * 1.1
      val peaks = daily.filter(isPeak)
      val wBest = Window.partitionBy($"pr")
        .orderBy($"c".desc, $"d".asc)
      peaks.withColumn("rn", row_number().over(wBest))
        .groupBy($"pr".as("o_orderpriority"))
        .agg(count(lit(1)).as("n_peaks"),
          max(when($"rn" === 1, $"d")).as("top_peak_day"),
          (max(when($"rn" === 1, $"c")) / 100.0).as("top_peak_revenue"))
        .orderBy($"o_orderpriority")
    },
    Some("""WITH daily AS (
           |  SELECT o_orderpriority AS pr, date_trunc('day', o_orderdate)
           |      AS d,
           |    round(sum(o_totalprice) * 100)::BIGINT AS c
           |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
           |lg AS (
           |  SELECT pr, d, c,
           |    lag(c, 1) OVER (PARTITION BY pr ORDER BY d) AS pv,
           |    lead(c, 1) OVER (PARTITION BY pr ORDER BY d) AS nx
           |  FROM daily),
           |pk AS (
           |  SELECT pr, d, c,
           |    row_number() OVER (PARTITION BY pr ORDER BY c DESC, d)
           |      AS rn
           |  FROM lg
           |  WHERE pv IS NOT NULL AND nx IS NOT NULL
           |    AND c > pv * 1.1 AND c > nx * 1.1)
           |SELECT pr AS o_orderpriority, count(*)::BIGINT AS n_peaks,
           |  max(CASE WHEN rn = 1 THEN d END)::TIMESTAMP AS top_peak_day,
           |  max(CASE WHEN rn = 1 THEN c END) / 100.0 AS top_peak_revenue
           |FROM pk GROUP BY pr ORDER BY o_orderpriority""".stripMargin))

  /** X167: weighted effective sample size ESS = (Σw)²/Σw² and the
    * Kish design effect n/ESS over the q91-style A-ES weights (orders
    * weighted by price) — the importance-sampling health readout. */
  private val q276 = Q("q276_ess",
    (s, dir) => {
      import s.implicits._
      val a = t(s, dir, "orders")
        .select(($"o_totalprice" / 100000.0).as("w"))
        .agg(count(lit(1)).as("n"),
          sum($"w").as("__sw"), sum($"w" * $"w").as("__sww"))
      a.select($"n",
        round($"__sw", 4).as("sum_w"),
        round($"__sw" * $"__sw" / $"__sww", 2).as("ess"),
        round($"n" / ($"__sw" * $"__sw" / $"__sww"), 4).as("design_effect"))
    },
    Some("""WITH a AS (
           |  SELECT count(*)::BIGINT AS n,
           |    sum(o_totalprice / 100000.0) AS sw,
           |    sum((o_totalprice / 100000.0) * (o_totalprice / 100000.0))
           |      AS sww
           |  FROM orders)
           |SELECT n, round(sw, 4) AS sum_w,
           |  round(sw * sw / sww, 2) AS ess,
           |  round(n / (sw * sw / sww), 4) AS design_effect
           |FROM a""".stripMargin))

  val all: Seq[Q] = Seq(q274, q275, q276)
}
