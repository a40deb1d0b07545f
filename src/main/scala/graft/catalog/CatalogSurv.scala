package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch AA (X159+): KM scalar
  * endpoints (median survival + RMST), collinearity diagnostics (VIF),
  * and the weekend-uplift Welch readout over the daily revenue series.
  */
object CatalogSurv {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def churnSubjects(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val u = t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(to_date(min($"o_orderdate")).as("fd"),
        to_date(max($"o_orderdate")).as("ld"))
    val mx = u.agg(max($"ld").as("md"))
    u.crossJoin(broadcast(mx))
      .select(datediff($"ld", $"fd").cast("long").as("dur"),
        when(datediff($"md", $"ld") > 180, 1).otherwise(0).as("ev"))
  }

  private val kmSql =
    """u AS (
      |  SELECT o_custkey, min(o_orderdate::DATE) AS fd,
      |         max(o_orderdate::DATE) AS ld
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT max(ld) AS md FROM u),
      |subj AS (
      |  -- complete-case on the time axis (kaplanMeier contract)
      |  SELECT datediff('day', fd, ld)::BIGINT AS t,
      |         CASE WHEN datediff('day', ld, md) > 180
      |              THEN 1 ELSE 0 END AS ev
      |  FROM u, mx WHERE fd IS NOT NULL),
      |byt AS (SELECT t, sum(ev)::BIGINT AS n_event,
      |          sum(1 - ev)::BIGINT AS n_censored
      |        FROM subj GROUP BY 1),
      |w AS (SELECT t, n_event, n_censored,
      |        (sum(n_event + n_censored) OVER ()
      |         - coalesce(sum(n_event + n_censored) OVER (
      |             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
      |             AND 1 PRECEDING), 0))::BIGINT AS n_risk
      |      FROM byt),
      |sv AS (SELECT t, n_risk, n_event, n_censored,
      |         CASE WHEN n_event = 0 OR n_event = n_risk THEN 0.0
      |              ELSE ln((n_risk - n_event)::DOUBLE / n_risk)
      |         END AS lt,
      |         min(CASE WHEN n_event = n_risk AND n_event > 0
      |                  THEN 0 ELSE 1 END) OVER (ORDER BY t
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS alive
      |       FROM w),
      |km AS (
      |  SELECT t,
      |    CASE WHEN alive = 0 THEN 0.0
      |         ELSE round(exp(sum(lt) OVER (ORDER BY t
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
      |    END AS survival
      |  FROM sv)""".stripMargin

  /** X159: KM scalar endpoints ([[graft.de.Survival.kmSummary]]) —
    * median survival and restricted mean survival time of the q168
    * churn cohort; the oracle extends the q168 KM CTE with the same
    * lead window and step integral. */
  private val q268 = Q("q268_km_summary",
    (s, dir) => {
      graft.de.Survival.kmSummary(churnSubjects(s, dir), "dur", "ev")
    },
    Some(s"""WITH $kmSql,
           |nx AS (
           |  SELECT t, survival, lead(t, 1) OVER (ORDER BY t) AS nt,
           |    min(t) OVER () AS ft
           |  FROM km)
           |SELECT count(*)::BIGINT AS n_times, max(t)::BIGINT AS max_t,
           |  min(CASE WHEN survival <= 0.5 THEN t END)::BIGINT
           |    AS median_t,
           |  round(max(CASE WHEN survival <= 0.5 THEN survival END), 6)
           |    AS s_at_median,
           |  round(max(ft)::DOUBLE +
           |    sum(CASE WHEN nt IS NOT NULL
           |        THEN survival * (nt - t) ELSE 0.0 END), 4) AS rmst
           |FROM nx""".stripMargin))

  /** X160: variance inflation factor of the q224 regressor pair —
    * VIF = 1/(1−r²), the "are my regressors fighting" gate read before
    * trusting ols2 coefficients. */
  private val q269 = Q("q269_vif",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").groupBy($"l_orderkey")
        .agg(count(lit(1)).as("x1"), sum($"l_quantity").as("x2"))
      val a = li.agg(count(lit(1)).as("n"),
        sum($"x1".cast("double")).as("s1"), sum($"x2").as("s2"),
        sum($"x1" * $"x1").cast("double").as("s11"),
        sum($"x2" * $"x2").as("s22"),
        sum($"x1" * $"x2").as("s12"))
      val n = $"n".cast("double")
      val r = ($"s12" - $"s1" * $"s2" / n) /
        nullif(sqrt(($"s11" - $"s1" * $"s1" / n) *
          ($"s22" - $"s2" * $"s2" / n)), lit(0.0))
      a.select($"n", round(r, 4).as("r_x1_x2"),
        round(lit(1.0) - r * r, 4).as("tolerance"),
        round(lit(1.0) / nullif(lit(1.0) - r * r, lit(0.0)), 4)
          .as("vif"))
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey, count(*)::DOUBLE AS x1,
           |         sum(l_quantity) AS x2
           |  FROM lineitem GROUP BY 1),
           |a AS (
           |  SELECT count(*)::BIGINT AS n, sum(x1) AS s1, sum(x2) AS s2,
           |    sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
           |    sum(x1 * x2) AS s12
           |  FROM li),
           |c AS (
           |  SELECT n,
           |    (s12 - s1 * s2 / n)
           |      / nullif(sqrt((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n)),
           |               0) AS r
           |  FROM a)
           |SELECT n, round(r, 4) AS r_x1_x2,
           |  round(1.0 - r * r, 4) AS tolerance,
           |  round(1.0 / nullif(1.0 - r * r, 0), 4) AS vif
           |FROM c""".stripMargin))

  /** X161: weekend revenue uplift — Welch t + p
    * ([[graft.de.Stats.welchTTest]]) between weekend and weekday
    * exact-cents daily revenue; the q14 Simpson-integrated t-tail
    * oracle over the daily series. */
  private val q270 = Q("q270_weekend_uplift",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "orders")
        .groupBy(date_trunc("day", $"o_orderdate").as("d"))
        .agg((round(sum($"o_totalprice") * 100).cast("long") / 100.0)
          .as("v"))
        .withColumn("grp",
          when(pmod(dayofweek($"d") + 5, lit(7)) + 1 >= 6, "wend")
            .otherwise("wday"))
        .withColumn("metric", lit("daily_rev"))
      graft.de.Stats.welchTTest(daily, Seq("metric"), "grp", "v",
          caseVal = "wend", controlVal = "wday")
        .select($"metric", round($"t_stat", 4).as("t_stat"),
          round($"pvalue", 6).as("pvalue"))
    },
    Some("""WITH daily AS (
           |  SELECT date_trunc('day', o_orderdate) AS d,
           |    round(sum(o_totalprice) * 100)::BIGINT / 100.0 AS v
           |  FROM orders GROUP BY 1),
           |g AS (SELECT v, CASE WHEN isodow(d) >= 6 THEN 'wend'
           |                     ELSE 'wday' END AS grp
           |      FROM daily),
           |st AS (
           |  SELECT 'daily_rev' AS metric,
           |    avg(CASE WHEN grp = 'wend' THEN v END) AS mean_a,
           |    var_samp(CASE WHEN grp = 'wend' THEN v END) AS var_a,
           |    count(CASE WHEN grp = 'wend' THEN v END) AS n_a,
           |    avg(CASE WHEN grp = 'wday' THEN v END) AS mean_n,
           |    var_samp(CASE WHEN grp = 'wday' THEN v END) AS var_n,
           |    count(CASE WHEN grp = 'wday' THEN v END) AS n_n
           |  FROM g),
           |w AS (SELECT metric,
           |        (mean_a - mean_n)
           |          / nullif(sqrt(var_a / n_a + var_n / n_n), 0) AS t,
           |        power(var_a / n_a + var_n / n_n, 2)
           |          / nullif(power(var_a / n_a, 2) / (n_a - 1)
           |                   + power(var_n / n_n, 2) / (n_n - 1), 0)
           |          AS df
           |      FROM st),
           |gg AS (SELECT metric, t, df / 2.0 AS a,
           |         sqrt(1 - df / (df + t * t)) AS lo FROM w),
           |grid AS (SELECT metric, t, a, lo,
           |           unnest(generate_series(0, 20000)) AS i FROM gg),
           |pts AS (SELECT metric, t, a,
           |          lo + (1.0 - lo) * i / 20000 AS u,
           |          CASE WHEN i = 0 OR i = 20000 THEN 1
           |               WHEN i % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          (1.0 - lo) / 20000 AS h
           |        FROM grid),
           |simpson AS (SELECT metric, max(t) AS t, max(a) AS a,
           |              sum(wt * 2 * exp((a - 1.0)
           |                * ln(greatest(1e-300, 1 - u * u))))
           |                * max(h) / 3.0 AS binc
           |            FROM pts GROUP BY metric)
           |SELECT metric, round(t, 4) AS t_stat,
           |  round(binc / exp(lgamma(a) + lgamma(0.5)
           |    - lgamma(a + 0.5)), 6) AS pvalue
           |FROM simpson""".stripMargin))

  val all: Seq[Q] = Seq(q268, q269, q270)
}
