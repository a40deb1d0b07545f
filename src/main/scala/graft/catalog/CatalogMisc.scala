package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch BB (X162+):
  * capture–recapture population estimation, the Wald–Wolfowitz runs
  * test, and the Lo–MacKinlay variance-ratio probe.
  */
object CatalogMisc {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X162: Chapman capture–recapture estimator — the active-customer
    * universe inferred from two yearly "captures" (1995, 1996):
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1 with the standard Seber variance and
    * a 95% normal CI. Exact integer margins; one aggregate over the
    * two distinct-key sets. */
  private val q271 = Q("q271_capture_recapture",
    (s, dir) => {
      import s.implicits._
      val y95 = t(s, dir, "orders")
        .filter(year($"o_orderdate") === 1995)
        .select($"o_custkey").distinct().withColumn("in95", lit(1))
      val y96 = t(s, dir, "orders")
        .filter(year($"o_orderdate") === 1996)
        .select($"o_custkey").distinct().withColumn("in96", lit(1))
      val j = y95.join(y96, Seq("o_custkey"), "full_outer")
      val a = j.agg(
        sum(coalesce($"in95", lit(0))).cast("long").as("n1"),
        sum(coalesce($"in96", lit(0))).cast("long").as("n2"),
        sum(when($"in95".isNotNull && $"in96".isNotNull, 1L)
          .otherwise(0L)).as("m"))
      val n1 = $"n1".cast("double")
      val n2 = $"n2".cast("double")
      val m = $"m".cast("double")
      val est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
      val v = (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) /
        ((m + 1) * (m + 1) * (m + 2))
      a.select($"n1", $"n2", $"m",
        round(est, 2).as("n_hat"),
        round(sqrt(v), 2).as("se"),
        round(est - lit(1.96) * sqrt(v), 2).as("ci_lo"),
        round(est + lit(1.96) * sqrt(v), 2).as("ci_hi"))
    },
    Some("""WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
           |            WHERE year(o_orderdate) = 1995),
           |y96 AS (SELECT DISTINCT o_custkey FROM orders
           |        WHERE year(o_orderdate) = 1996),
           |a AS (
           |  SELECT (SELECT count(*) FROM y95)::BIGINT AS n1,
           |    (SELECT count(*) FROM y96)::BIGINT AS n2,
           |    (SELECT count(*) FROM y95 JOIN y96 USING (o_custkey))::BIGINT
           |      AS m),
           |e AS (
           |  SELECT n1, n2, m,
           |    (n1 + 1)::DOUBLE * (n2 + 1) / (m + 1) - 1 AS est,
           |    (n1 + 1)::DOUBLE * (n2 + 1) * (n1 - m) * (n2 - m)
           |      / ((m + 1)::DOUBLE * (m + 1) * (m + 2)) AS v
           |  FROM a)
           |SELECT n1, n2, m, round(est, 2) AS n_hat,
           |  round(sqrt(v), 2) AS se,
           |  round(est - 1.96 * sqrt(v), 2) AS ci_lo,
           |  round(est + 1.96 * sqrt(v), 2) AS ci_hi
           |FROM e""".stripMargin))

  /** X163: Wald–Wolfowitz runs test for randomness of the daily
    * revenue series around its median — runs counted with one lag
    * window over exact above/below indicators (ties-at-median dropped,
    * the standard convention); z against μ = 2n₁n₂/n + 1,
    * σ² = (μ−1)(μ−2)/(n−1); two-sided p via the Simpson normal
    * oracle. */
  private val q272 = Q("q272_runs_test",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.functions.gfunctions.normal_sf
      val daily = t(s, dir, "orders")
        .filter($"o_orderdate".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy(date_trunc("day", $"o_orderdate").as("d"))
        .agg(round(sum($"o_totalprice") * 100).cast("long").as("cents"))
      val med = daily.agg(percentile($"cents", lit(0.5)).as("__med"))
      val marked = daily.crossJoin(broadcast(med))
        .filter($"cents" =!= $"__med")
        .withColumn("above", ($"cents" > $"__med").cast("int"))
      val w = Window.orderBy($"d")
      val runs = marked
        .withColumn("__prev", lag($"above", 1).over(w))
        .agg(count(lit(1)).as("n"),
          sum($"above").cast("long").as("n1"),
          (count(lit(1)) - sum($"above")).cast("long").as("n2"),
          (sum(when($"__prev".isNull || $"__prev" =!= $"above", 1L)
            .otherwise(0L))).as("r"))
      val n1 = $"n1".cast("double")
      val n2 = $"n2".cast("double")
      val n = n1 + n2
      val mu = lit(2.0) * n1 * n2 / n + 1
      val sig2 = (mu - 1) * (mu - 2) / (n - 1)
      val z = ($"r" - mu) / nullif(sqrt(sig2), lit(0.0))
      runs.select($"n", $"n1", $"n2", $"r",
        round(mu, 4).as("expected_runs"),
        round(z, 4).as("z"),
        round(lit(2.0) * normal_sf(abs(z)), 6).as("p_value"))
    },
    Some("""WITH daily AS (
           |  SELECT date_trunc('day', o_orderdate) AS d,
           |    round(sum(o_totalprice) * 100)::BIGINT AS cents
           |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
           |md AS (SELECT quantile_cont(cents, 0.5) AS m FROM daily),
           |mk AS (
           |  SELECT d, CASE WHEN cents > m THEN 1 ELSE 0 END AS above
           |  FROM daily, md WHERE cents != m),
           |lg AS (
           |  SELECT above, lag(above, 1) OVER (ORDER BY d) AS prv
           |  FROM mk),
           |a AS (
           |  SELECT count(*)::BIGINT AS n, sum(above)::BIGINT AS n1,
           |    (count(*) - sum(above))::BIGINT AS n2,
           |    sum(CASE WHEN prv IS NULL OR prv != above
           |        THEN 1 ELSE 0 END)::BIGINT AS r
           |  FROM lg),
           |st AS (
           |  SELECT n, n1, n2, r,
           |    2.0 * n1 * n2 / (n1 + n2) + 1 AS mu,
           |    ((2.0 * n1 * n2 / (n1 + n2) + 1) - 1)
           |      * ((2.0 * n1 * n2 / (n1 + n2) + 1) - 2)
           |      / (n1 + n2 - 1) AS sig2
           |  FROM a),
           |zc AS (SELECT n, n1, n2, r, mu,
           |         (r - mu) / nullif(sqrt(sig2), 0) AS z
           |       FROM st),
           |grid AS (SELECT abs(z) AS az,
           |           unnest(generate_series(0, 20000)) AS i FROM zc),
           |pts AS (SELECT az * i / 20000 AS x,
           |          CASE WHEN i = 0 OR i = 20000 THEN 1
           |               WHEN i % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          az / 20000 AS h
           |        FROM grid),
           |ig AS (SELECT sum(wt * exp(-x * x / 2)) * max(h) / 3.0
           |         / sqrt(2 * pi()) AS phi
           |       FROM pts)
           |SELECT n, n1, n2, r, round(mu, 4) AS expected_runs,
           |  round(z, 4) AS z, round(1.0 - 2.0 * phi, 6) AS p_value
           |FROM zc, ig""".stripMargin))

  /** X164: Lo–MacKinlay variance-ratio probe VR(k) =
    * Var(k-period log returns)/(k·Var(1-period)) at k ∈ {2, 5} over
    * the daily revenue series — VR ≈ 1 for a random walk, < 1 for
    * mean reversion. Overlapping k-returns via lag windows; sample
    * variances. */
  private val q273 = Q("q273_variance_ratio",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy($"d")
      val daily = t(s, dir, "orders")
        .filter($"o_orderdate".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy(date_trunc("day", $"o_orderdate").as("d"))
        .agg((round(sum($"o_totalprice") * 100).cast("long") / 100.0)
          .as("v"))
        // log returns exist only on positive revenue days — DuckDB's
        // ln ERRORS on a fuzzed negative/zero day total where Spark
        // nulls (q283 log-domain discipline); the filter sits BEFORE
        // the lag windows so both engines difference the same series
        .filter($"v" > 0)
        .withColumn("lr", log($"v") - log(lag($"v", 1).over(w)))
        .withColumn("lr2", log($"v") - log(lag($"v", 2).over(w)))
        .withColumn("lr5", log($"v") - log(lag($"v", 5).over(w)))
      daily.agg(
        count($"lr").as("n_returns"),
        round(var_samp($"lr2") / (lit(2.0) * var_samp($"lr")), 4)
          .as("vr_2"),
        round(var_samp($"lr5") / (lit(5.0) * var_samp($"lr")), 4)
          .as("vr_5"))
    },
    Some("""WITH daily0 AS (
           |  SELECT date_trunc('day', o_orderdate) AS d,
           |    round(sum(o_totalprice) * 100)::BIGINT / 100.0 AS v
           |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
           |daily AS (SELECT * FROM daily0 WHERE v > 0),
           |r AS (
           |  SELECT ln(v) - ln(lag(v, 1) OVER (ORDER BY d)) AS lr,
           |    ln(v) - ln(lag(v, 2) OVER (ORDER BY d)) AS lr2,
           |    ln(v) - ln(lag(v, 5) OVER (ORDER BY d)) AS lr5
           |  FROM daily)
           |SELECT count(lr)::BIGINT AS n_returns,
           |  round(var_samp(lr2) / (2.0 * var_samp(lr)), 4) AS vr_2,
           |  round(var_samp(lr5) / (5.0 * var_samp(lr)), 4) AS vr_5
           |FROM r""".stripMargin))

  val all: Seq[Q] = Seq(q271, q272, q273)
}
