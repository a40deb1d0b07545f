package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch R (X122+):
  * hazard-scale survival (Nelson–Aalen), Poisson rate-ratio inference,
  * fixed-effect meta-analysis pooling, and two corpus-health gates
  * (OOV rate, Zipf fit).
  */
object CatalogEpi {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X122: Nelson–Aalen cumulative hazard + Fleming–Harrington
    * survival ([[graft.de.Survival.nelsonAalen]]) on the q168 customer
    * churn cohort (duration = first→last order, event = 180-day
    * dormancy). */
  private val q232 = Q("q232_nelson_aalen",
    (s, dir) => {
      import s.implicits._
      val u = t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(to_date(min($"o_orderdate")).as("fd"),
          to_date(max($"o_orderdate")).as("ld"))
      val mx = u.agg(max($"ld").as("md"))
      val subj = u.crossJoin(broadcast(mx))
        .select(datediff($"ld", $"fd").cast("long").as("dur"),
          when(datediff($"md", $"ld") > 180, 1).otherwise(0).as("ev"))
      graft.de.Survival.nelsonAalen(subj, "dur", "ev")
        .orderBy($"t")
    },
    Some("""WITH u AS (
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
           |      FROM byt)
           |SELECT t, n_risk, n_event, n_censored,
           |  round(sum(n_event::DOUBLE / n_risk) OVER (ORDER BY t
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
           |    AS cum_hazard,
           |  round(exp(-sum(n_event::DOUBLE / n_risk) OVER (ORDER BY t
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
           |    AS fh_survival
           |FROM w ORDER BY t""".stripMargin))

  /** X123: Poisson rate-ratio test
    * ([[graft.de.Experiment.rateRatio]]) — error rate per event-unit,
    * even- vs odd-keyed user cohorts; two-sided p via the
    * Simpson-integrated normal-tail oracle (q216 technique). */
  private val q233 = Q("q233_rate_ratio",
    (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .withColumn("grp",
          when($"user_id" % 2 === 0, "even").otherwise("odd"))
        .withColumn("is_err", $"event_type" === "error")
      graft.de.Experiment.rateRatio(e, "grp", "even", "odd", "is_err")
    },
    Some("""WITH e AS (
           |  SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END
           |           AS grp,
           |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ev
           |  FROM events),
           |a AS (
           |  SELECT
           |    sum(CASE WHEN grp = 'even' THEN ev ELSE 0 END)::BIGINT AS x_a,
           |    sum(CASE WHEN grp = 'even' THEN 1 ELSE 0 END)::BIGINT AS t_a,
           |    sum(CASE WHEN grp = 'odd' THEN ev ELSE 0 END)::BIGINT AS x_b,
           |    sum(CASE WHEN grp = 'odd' THEN 1 ELSE 0 END)::BIGINT AS t_b
           |  FROM e),
           |st AS (
           |  SELECT x_a, t_a, x_b, t_b,
           |    (x_a::DOUBLE / t_a) AS ra, (x_b::DOUBLE / t_b) AS rb,
           |    ln((x_a::DOUBLE / t_a) / (x_b::DOUBLE / t_b))
           |      / sqrt(1.0 / x_a + 1.0 / x_b) AS z
           |  FROM a),
           |grid AS (SELECT abs(z) AS az,
           |           unnest(generate_series(0, 20000)) AS i
           |         FROM st),
           |pts AS (SELECT az * i / 20000 AS x,
           |          CASE WHEN i = 0 OR i = 20000 THEN 1
           |               WHEN i % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          az / 20000 AS h
           |        FROM grid),
           |ig AS (SELECT sum(wt * exp(-x * x / 2)) * max(h) / 3.0
           |         / sqrt(2 * pi()) AS phi
           |       FROM pts)
           |SELECT x_a, t_a, x_b, t_b, round(ra, 6) AS rate_a,
           |  round(rb, 6) AS rate_b, round(ra / rb, 4) AS rate_ratio,
           |  round(z, 4) AS z, round(1.0 - 2.0 * phi, 6) AS p_value
           |FROM st, ig""".stripMargin))

  /** X124: fixed-effect meta-analysis ([[graft.de.Meta.fixedEffect]])
    * pooling the per-p_type returned-vs-delivered price contrast (the
    * q13/q14 Welch construction: effect = mean diff, se = Welch SE)
    * with Cochran's Q and I² heterogeneity. */
  private val q234 = Q("q234_meta_pool",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
      val isA = $"l_returnflag" === "A"
      val isN = $"l_returnflag" === "N"
      val strata = li.filter(isA || isN)
        .groupBy($"p_type")
        // counts scope to non-null PRICES like the means/variances do
        // (fuzz-25: the q224 inconsistent-null class, Spark-side — a
        // fuzzed null price was in n but not in the moments)
        .agg(avg(when(isA, $"l_extendedprice")).as("ma"),
          var_samp(when(isA, $"l_extendedprice")).as("va"),
          count(when(isA, $"l_extendedprice")).as("na"),
          avg(when(isN, $"l_extendedprice")).as("mn"),
          var_samp(when(isN, $"l_extendedprice")).as("vn"),
          count(when(isN, $"l_extendedprice")).as("nn"))
        .select($"p_type", ($"ma" - $"mn").as("effect"),
          sqrt($"va" / $"na" + $"vn" / $"nn").as("se"))
      graft.de.Meta.fixedEffect(strata, "effect", "se")
    },
    Some("""WITH st AS (
           |  SELECT p_type,
           |    avg(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END)
           |      AS ma,
           |    var_samp(CASE WHEN l_returnflag = 'A'
           |                  THEN l_extendedprice END) AS va,
           |    count(CASE WHEN l_returnflag = 'A'
           |               THEN l_extendedprice END)::BIGINT AS na,
           |    avg(CASE WHEN l_returnflag = 'N' THEN l_extendedprice END)
           |      AS mn,
           |    var_samp(CASE WHEN l_returnflag = 'N'
           |                  THEN l_extendedprice END) AS vn,
           |    count(CASE WHEN l_returnflag = 'N'
           |               THEN l_extendedprice END)::BIGINT AS nn
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  WHERE l_returnflag IN ('A', 'N')
           |  GROUP BY p_type),
           |ev AS (
           |  SELECT ma - mn AS e, sqrt(va / na + vn / nn) AS se
           |  FROM st
           |  WHERE ma IS NOT NULL AND mn IS NOT NULL
           |    AND sqrt(va / na + vn / nn) > 0),
           |a AS (
           |  SELECT count(*)::BIGINT AS k,
           |    sum(1.0 / (se * se)) AS sw,
           |    sum(e / (se * se)) AS swe,
           |    sum(e * e / (se * se)) AS swee
           |  FROM ev),
           |f AS (
           |  SELECT k, swe / sw AS pooled, sqrt(1.0 / sw) AS pse,
           |    swee - swe * swe / sw AS q, (k - 1)::DOUBLE AS dfree
           |  FROM a)
           |SELECT k, round(pooled, 4) AS pooled,
           |  round(pse, 4) AS pooled_se, round(pooled / pse, 4) AS z,
           |  round(q, 4) AS q_stat,
           |  CASE WHEN k >= 2 AND q > 0
           |       THEN round(greatest((q - dfree) / q, 0.0), 4) END AS i2
           |FROM f""".stripMargin))

  /** X125: out-of-vocabulary rate per document against the corpus
    * top-200 vocab ([[graft.text.TextAnalysis.oovRate]]) —
    * deterministic (count desc, term) vocab cut, broadcast to the
    * token stream. */
  private val q235 = Q("q235_oov_rate",
    (s, dir) => {
      import s.implicits._
      graft.text.TextAnalysis.oovRate(t(s, dir, "documents"),
          "doc_id", "text", vocabSize = 200)
        .withColumnRenamed("id", "doc_id")
        .orderBy($"doc_id")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
           |  FROM documents),
           |vc AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY 1),
           |vocab AS (SELECT w FROM vc ORDER BY c DESC, w LIMIT 200),
           |j AS (
           |  SELECT doc_id,
           |    CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END AS oov
           |  FROM tok LEFT JOIN vocab ON tok.w = vocab.w)
           |SELECT doc_id, count(*)::BIGINT AS n_tokens,
           |  sum(oov)::BIGINT AS n_oov,
           |  round(sum(oov)::DOUBLE / count(*), 4) AS oov_rate
           |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin))

  /** X126: Zipf-law exponent of the corpus frequency distribution
    * ([[graft.text.CorpusStats.zipfFit]]) — ln–ln OLS over the ranked
    * vocabulary. */
  private val q236 = Q("q236_zipf",
    (s, dir) => {
      graft.text.CorpusStats.zipfFit(t(s, dir, "documents"), "text")
    },
    Some("""WITH tok AS (
           |  SELECT unnest(regexp_extract_all(text, '\S+')) AS term
           |  FROM documents),
           |vc AS (SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY 1),
           |r AS (SELECT c,
           |        row_number() OVER (ORDER BY c DESC, term) AS rk
           |      FROM vc),
           |xy AS (SELECT ln(rk::DOUBLE) AS x, ln(c::DOUBLE) AS y, c
           |       FROM r),
           |a AS (
           |  SELECT count(*)::BIGINT AS n_terms, sum(c)::BIGINT AS n_tokens,
           |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
           |    sum(x * y) AS sxy, sum(y * y) AS syy
           |  FROM xy),
           |f AS (
           |  SELECT n_terms, n_tokens, sx, sy, sxx, sxy, syy,
           |    (sxy - sx * sy / n_terms::DOUBLE)
           |      / nullif(sxx - sx * sx / n_terms::DOUBLE, 0) AS slope
           |  FROM a)
           |SELECT n_terms, n_tokens, round(-slope, 4) AS alpha,
           |  round((sy - slope * sx) / n_terms::DOUBLE, 4) AS intercept,
           |  round((sxy - sx * sy / n_terms::DOUBLE)
           |        * (sxy - sx * sy / n_terms::DOUBLE)
           |    / nullif((sxx - sx * sx / n_terms::DOUBLE)
           |             * (syy - sy * sy / n_terms::DOUBLE), 0), 4) AS r2
           |FROM f""".stripMargin))

  val all: Seq[Q] = Seq(q232, q233, q234, q235, q236)
}
