package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-8 batch: normality testing
  * (X213 Jarque–Bera), robust trend (X214 Theil–Sen), circadian
  * statistics (X215), scorecard screening (X216 WoE/IV, X217 target
  * encoding), and sequential testing (X218 SPRT).
  */
object CatalogStats3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X213: Jarque–Bera normality screen of event values per type —
    * χ²₂ survival is exactly exp(−JB/2), so the p-value is
    * engine-exact with no numeric integration. */
  private val q322 = Q("q322_jarque_bera",
    (s, dir) => {
      import s.implicits._
      graft.de.Moments.jarqueBera(t(s, dir, "events"),
        "event_type", "value").orderBy($"event_type")
    },
    Some("""WITH a AS (
           |  SELECT event_type, count(*)::DOUBLE AS n,
           |    sum(value) AS s1, sum(value * value) AS s2,
           |    sum(value * value * value) AS s3,
           |    sum(value * value * value * value) AS s4
           |  FROM events WHERE value IS NOT NULL GROUP BY 1),
           |m AS (
           |  SELECT event_type, n, s1 / n AS mu,
           |    s2 / n - (s1 / n) * (s1 / n) AS m2,
           |    s3 / n - 3 * (s1 / n) * s2 / n
           |      + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
           |    s4 / n - 4 * (s1 / n) * s3 / n
           |      + 6 * (s1 / n) * (s1 / n) * s2 / n
           |      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
           |  FROM a),
           |st AS (
           |  SELECT event_type, n,
           |    m3 / (sqrt(m2) * m2) AS s,
           |    m4 / (m2 * m2) - 3 AS k
           |  FROM m),
           |jb AS (
           |  SELECT event_type, n, s, k,
           |    n / 6 * (s * s + k * k / 4) AS jb
           |  FROM st)
           |SELECT event_type, n::BIGINT AS n,
           |  round(s, 4) AS skewness, round(k, 4) AS kurtosis,
           |  round(jb, 4) AS jb, round(exp(-jb / 2), 6) AS p_value
           |FROM jb ORDER BY event_type""".stripMargin))

  /** X214: Theil–Sen robust slope of the daily event count per type —
    * the exact median of all pairwise day-over-day slopes; one outlier
    * day cannot move the trend estimate. Series grain (days), so the
    * O(n²) pair join is domain-bounded by contract. */
  private val q323 = Q("q323_theil_sen",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type",
          datediff(to_date($"ts"), lit("2024-01-01")).as("day"))
        .agg(count(lit(1)).as("y"))
      graft.de.RobustStats.theilSen(daily, "event_type", "day", "y")
        .orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type, date_diff('day', DATE '2024-01-01',
           |           ts::DATE)::DOUBLE AS x, count(*)::DOUBLE AS y
           |  FROM events WHERE ts IS NOT NULL
           |  GROUP BY event_type, ts::DATE),
           |sl AS (
           |  SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS s
           |  FROM d a JOIN d b ON a.event_type = b.event_type
           |    AND a.x < b.x),
           |med AS (
           |  SELECT event_type, count(*)::BIGINT AS n_pairs,
           |    quantile_cont(s, 0.5) AS slope
           |  FROM sl GROUP BY 1),
           |anch AS (
           |  SELECT event_type, count(*)::BIGINT AS n,
           |    quantile_cont(x, 0.5) AS mx, quantile_cont(y, 0.5) AS my
           |  FROM d GROUP BY 1)
           |SELECT anch.event_type, n, coalesce(n_pairs, 0) AS n_pairs,
           |  round(slope, 6) AS slope,
           |  round(my - slope * mx, 6) AS intercept
           |FROM anch LEFT JOIN med USING (event_type)
           |ORDER BY event_type""".stripMargin))

  /** X215: circular time-of-day battery per event type — resultant
    * length + circular mean direction as the peak hour; the correct
    * answer when activity straddles midnight. */
  private val q324 = Q("q324_circadian",
    (s, dir) => {
      import s.implicits._
      graft.events.Circadian.timeOfDayStats(t(s, dir, "events"),
        "event_type", "ts").orderBy($"event_type")
    },
    Some("""WITH a AS (
           |  SELECT event_type, count(*)::BIGINT AS n,
           |    avg(cos((hour(ts) * 3600 + minute(ts) * 60 +
           |      date_part('second', ts)) * 2 * pi() / 86400)) AS c,
           |    avg(sin((hour(ts) * 3600 + minute(ts) * 60 +
           |      date_part('second', ts)) * 2 * pi() / 86400)) AS s
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
           |r AS (SELECT event_type, n, sqrt(c * c + s * s) AS rb,
           |        atan2(s, c) AS dir
           |      FROM a)
           |SELECT event_type, n, round(rb, 4) AS r_bar,
           |  CASE WHEN rb > 1e-12 THEN
           |    round((CASE WHEN dir < 0 THEN dir + 2 * pi()
           |                ELSE dir END) * 24 / (2 * pi()), 4)
           |  END AS peak_hour,
           |  round(1 - rb, 4) AS circ_variance,
           |  CASE WHEN rb > 1e-12 THEN
           |    round(sqrt(-2 * ln(rb)), 4) END AS circ_std
           |FROM r ORDER BY event_type""".stripMargin))

  /** X216: weight-of-evidence / information value of order priority
    * against the finished-order flag — the scorecard feature screen. */
  private val q325 = Q("q325_woe_iv",
    (s, dir) => {
      import s.implicits._
      graft.ml.Scorecard.woeIv(
        t(s, dir, "orders").select($"o_orderpriority",
          when($"o_orderstatus" === "F", 1).otherwise(0).as("target")),
        "o_orderpriority", "target")
        .orderBy($"o_orderpriority")
    },
    Some("""WITH cell AS (
           |  SELECT o_orderpriority, count(*)::BIGINT AS n,
           |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0
           |        END)::BIGINT AS n_pos
           |  FROM orders GROUP BY 1),
           |sh AS (
           |  SELECT o_orderpriority, n, n_pos,
           |    n_pos::DOUBLE / sum(n_pos) OVER () AS pos,
           |    (n - n_pos)::DOUBLE / sum(n - n_pos) OVER () AS neg
           |  FROM cell),
           |w AS (
           |  SELECT *, CASE WHEN pos > 0 AND neg > 0
           |                 THEN ln(pos / neg) END AS woe
           |  FROM sh)
           |SELECT o_orderpriority, n, n_pos,
           |  round(pos, 6) AS pos_share, round(neg, 6) AS neg_share,
           |  round(woe, 6) AS woe,
           |  round(sum(coalesce((pos - neg) * woe, 0)) OVER (), 6)
           |    AS iv
           |FROM w ORDER BY o_orderpriority""".stripMargin))

  /** X217: smoothed target encoding of market segment against the
    * positive-balance flag (m = 20 pseudo-count prior shrinkage). */
  private val q326 = Q("q326_target_encoding",
    (s, dir) => {
      import s.implicits._
      graft.ml.Scorecard.targetEncode(
        t(s, dir, "customer").select($"c_mktsegment",
          when($"c_acctbal" > 0, 1.0).otherwise(0.0).as("target")),
        "c_mktsegment", "target", m = 20.0)
        .orderBy($"c_mktsegment")
    },
    Some("""WITH cell AS (
           |  SELECT c_mktsegment, count(*)::BIGINT AS n,
           |    sum(CASE WHEN c_acctbal > 0 THEN 1.0 ELSE 0.0 END) AS s
           |  FROM customer GROUP BY 1),
           |g AS (
           |  SELECT sum(CASE WHEN c_acctbal > 0 THEN 1.0 ELSE 0.0
           |             END) / count(*) AS gmean
           |  FROM customer)
           |SELECT c_mktsegment, n, round(s / n, 6) AS cat_mean,
           |  round((s + 20.0 * gmean) / (n + 20.0), 6) AS encoded
           |FROM cell CROSS JOIN g ORDER BY c_mktsegment""".stripMargin))

  /** X218: Wald SPRT walk per event type — H0 p=0.30 vs H1 p=0.36 on
    * the event_id%3=0 indicator in (ts, event_id) order; decision at
    * the FIRST boundary crossing, the sequential-testing semantics. */
  private val q327 = Q("q327_sprt",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.sprtBernoulli(
        t(s, dir, "events").filter($"ts".isNotNull)
          .select($"event_type", $"ts", $"event_id",
            when($"event_id" % 3 === 0, 1).otherwise(0).as("x")),
        "event_type", Seq("ts", "event_id"), "x",
        p0 = 0.30, p1 = 0.36)
        .orderBy($"event_type")
    },
    Some("""WITH obs AS (
           |  SELECT event_type,
           |    CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS x,
           |    ts, event_id
           |  FROM events WHERE ts IS NOT NULL),
           |walk AS (
           |  SELECT event_type, x,
           |    sum(CASE WHEN x = 1 THEN ln(0.36 / 0.30)
           |        ELSE ln(0.64 / 0.70) END) OVER (
           |      PARTITION BY event_type ORDER BY ts, event_id
           |      ROWS UNBOUNDED PRECEDING) AS llr,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY ts, event_id) AS i
           |  FROM obs),
           |agg AS (
           |  SELECT event_type, count(*)::BIGINT AS n,
           |    sum(x)::BIGINT AS x,
           |    min(CASE WHEN llr >= ln(0.95 / 0.05) THEN i END)
           |      AS hit1,
           |    min(CASE WHEN llr <= ln(0.05 / 0.95) THEN i END)
           |      AS hit0
           |  FROM walk GROUP BY 1)
           |SELECT event_type, n, x,
           |  round(x * ln(0.36 / 0.30) + (n - x) * ln(0.64 / 0.70), 6)
           |    AS llr,
           |  CASE WHEN hit1 IS NOT NULL AND (hit0 IS NULL OR
           |            hit1 <= hit0) THEN 'accept_h1'
           |       WHEN hit0 IS NOT NULL THEN 'accept_h0'
           |       ELSE 'continue' END AS decision,
           |  least(hit1, hit0)::BIGINT AS n_decision
           |FROM agg ORDER BY event_type""".stripMargin))

  /** X219: Weibull shape/scale per event type by median-rank
    * regression over the value column as a duration — the parametric
    * survival complement to q168/q232. */
  private val q328 = Q("q328_weibull_fit",
    (s, dir) => {
      import s.implicits._
      graft.de.Survival.weibullFit(t(s, dir, "events"),
        "event_type", "value").orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type, value::DOUBLE AS t FROM events
           |  WHERE value IS NOT NULL AND value > 0),
           |r AS (
           |  SELECT event_type, ln(t) AS x,
           |    ln(-ln(1 - (row_number() OVER (PARTITION BY event_type
           |          ORDER BY t) - 0.3) /
           |        (count(*) OVER (PARTITION BY event_type) + 0.4)))
           |      AS y
           |  FROM d),
           |a AS (
           |  SELECT event_type, count(*)::BIGINT AS n,
           |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
           |    sum(y * y) AS syy, sum(x * y) AS sxy
           |  FROM r GROUP BY 1),
           |f AS (
           |  SELECT event_type, n,
           |    (sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0)
           |      AS slope,
           |    sxx - sx * sx / n AS vx, syy - sy * sy / n AS vy,
           |    sxy - sx * sy / n AS cxy, sx, sy
           |  FROM a)
           |SELECT event_type, n, round(slope, 4) AS shape,
           |  round(exp(-((sy - slope * sx) / n) / slope), 4) AS scale,
           |  round(cxy * cxy / nullif(vx * vy, 0), 4) AS r2
           |FROM f ORDER BY event_type""".stripMargin))

  /** X220: Little's-law queueing profile per event type over the
    * q298 interval convention (duration = value seconds). */
  private val q329 = Q("q329_littles_law",
    (s, dir) => {
      import s.implicits._
      val iv = t(s, dir, "events").select($"event_type",
        unix_micros($"ts").as("s"),
        (unix_micros($"ts") + round($"value").cast("long") * 1000000L)
          .as("e"))
      graft.events.Intervals.littlesLaw(iv, "event_type", "s", "e")
        .orderBy($"event_type")
    },
    Some("""WITH iv AS (
           |  -- operator contract: null end = no interval (fuzz-21)
           |  SELECT event_type, epoch_us(ts) AS s,
           |    epoch_us(ts) + round(value)::BIGINT * 1000000 AS e
           |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
           |agg AS (
           |  SELECT event_type, count(*)::BIGINT AS n,
           |    min(s) AS t0, max(e) AS t1, sum(e - s) AS sd,
           |    avg(e - s) AS w
           |  FROM iv GROUP BY 1),
           |ev AS (
           |  SELECT event_type, s AS t, 1 AS d FROM iv
           |  UNION ALL SELECT event_type, e, -1 FROM iv),
           |run AS (
           |  SELECT event_type, sum(d) OVER (PARTITION BY event_type
           |    ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS run
           |  FROM ev),
           |pk AS (SELECT event_type, max(run)::BIGINT AS peak
           |       FROM run GROUP BY 1)
           |SELECT agg.event_type, n AS n_intervals,
           |  round((t1 - t0) / 1e6, 4) AS span_sec,
           |  round(n / nullif((t1 - t0) / 1e6, 0) * 3600, 4)
           |    AS arrivals_per_hour,
           |  round(w / 1e6, 4) AS w_avg_sec,
           |  round(sd / 1e6 / nullif((t1 - t0) / 1e6, 0), 4) AS l_avg,
           |  peak
           |FROM agg JOIN pk USING (event_type)
           |ORDER BY event_type""".stripMargin))

  /** X221: Friedman test across the 3 interaction event types with
    * user cohorts as blocks (k = 3 → dof 2 → exact χ² p-value). */
  private val q330 = Q("q330_friedman",
    (s, dir) => {
      import s.implicits._
      graft.de.RankStats.friedman(
        t(s, dir, "events")
          .filter($"event_type".isin("click", "view", "purchase"))
          .select(pmod($"user_id", lit(20)).as("cohort"),
            $"event_type", $"value"),
        "cohort", "event_type", "value")
    },
    Some("""WITH cell AS (
           |  SELECT user_id % 20 AS b, event_type AS t,
           |    avg(value) AS v
           |  FROM events
           |  WHERE event_type IN ('click', 'view', 'purchase')
           |    AND value IS NOT NULL
           |  GROUP BY 1, 2),
           |comp AS (SELECT *, count(*) OVER (PARTITION BY b) AS kb
           |         FROM cell),
           |c2 AS (SELECT b, t, v FROM comp WHERE kb = 3),
           |pv AS (SELECT b, v, count(*) AS c FROM c2 GROUP BY 1, 2),
           |r AS (
           |  SELECT b, v, coalesce(sum(c) OVER (PARTITION BY b
           |      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
           |      1 PRECEDING), 0) + (c + 1) / 2.0 AS rk
           |  FROM pv),
           |rs AS (
           |  SELECT t, sum(rk) AS rsum, count(*) AS nb
           |  FROM c2 JOIN r USING (b, v) GROUP BY 1),
           |agg AS (SELECT max(nb) AS n_blocks,
           |          sum(rsum * rsum) AS sq
           |        FROM rs),
           |qq AS (
           |  SELECT n_blocks,
           |    round(12.0 / (n_blocks * 3 * 4) * sq
           |      - 3.0 * n_blocks * 4, 4) AS q
           |  FROM agg)
           |SELECT 3 AS k, n_blocks::BIGINT AS n_blocks, q, 2 AS dof,
           |  round(exp(-q / 2), 6) AS p_value
           |FROM qq""".stripMargin))

  /** X222: Cochran's Q — did the high-value rate differ across the 3
    * interaction types for the same users (absent cell = 0)? */
  private val q331 = Q("q331_cochran_q",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.cochranQ(
        t(s, dir, "events")
          .filter($"event_type".isin("click", "view", "purchase"))
          .select($"user_id", $"event_type",
            when($"value" > 150, 1).otherwise(0).as("x")),
        "user_id", "event_type", "x")
    },
    Some("""WITH cell AS (
           |  SELECT user_id AS b, event_type AS t,
           |    max(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS x
           |  FROM events
           |  WHERE event_type IN ('click', 'view', 'purchase')
           |  GROUP BY 1, 2),
           |g AS (
           |  SELECT sum(gg) AS tt, sum(gg * gg) AS g2
           |  FROM (SELECT t, sum(x) AS gg FROM cell GROUP BY 1)),
           |l AS (
           |  SELECT count(*) AS n_blocks, sum(ll) AS l1,
           |    sum(ll * ll) AS l2
           |  FROM (SELECT b, sum(x) AS ll FROM cell GROUP BY 1)),
           |qq AS (
           |  SELECT n_blocks,
           |    round(2.0 * (3 * g2 - tt * tt) /
           |      nullif(3.0 * l1 - l2, 0), 4) AS q
           |  FROM g CROSS JOIN l)
           |SELECT 3 AS k, n_blocks::BIGINT AS n_blocks, q, 2 AS dof,
           |  round(exp(-q / 2), 6) AS p_value
           |FROM qq""".stripMargin))

  /** X223: directional association order-priority → order-status:
    * Goodman–Kruskal λ and the uncertainty coefficient side by
    * side. */
  private val q332 = Q("q332_predictive_assoc",
    (s, dir) =>
      graft.de.InfoTheory.predictiveAssociation(t(s, dir, "orders"),
        "o_orderpriority", "o_orderstatus"),
    Some("""WITH cells AS (
           |  SELECT o_orderpriority AS x, o_orderstatus AS y,
           |    count(*) AS c
           |  FROM orders GROUP BY 1, 2),
           |px AS (SELECT x, max(c) AS mx, sum(c) AS cx
           |       FROM cells GROUP BY 1),
           |a AS (SELECT sum(mx) AS smax, sum(cx) AS n,
           |        sum(cx * ln(cx)) AS clcx
           |      FROM px),
           |my AS (SELECT y, sum(c) AS cy FROM cells GROUP BY 1),
           |b AS (SELECT max(cy) AS ymax, sum(cy * ln(cy)) AS clcy
           |      FROM my),
           |j AS (SELECT sum(c * ln(c)) AS clcxy FROM cells)
           |SELECT n::BIGINT AS n,
           |  round((smax - ymax) /
           |    nullif((n - ymax)::DOUBLE, 0), 6) AS lambda,
           |  round((ln(n) - clcx / n + ln(n) - clcy / n
           |      - (ln(n) - clcxy / n)) /
           |    nullif(ln(n) - clcy / n, 0), 6) AS uncertainty
           |FROM a CROSS JOIN b CROSS JOIN j""".stripMargin))

  /** X224: Heaps'-law vocabulary-growth fit per source — template
    * spam saturates (low β), id soup never does (β → 1). */
  private val q333 = Q("q333_heaps_law",
    (s, dir) => {
      import s.implicits._
      graft.text.CorpusStats.heapsLaw(t(s, dir, "documents"),
        "source", "doc_id", "text").orderBy($"source")
    },
    Some("""WITH nd AS (
           |  SELECT source AS s, doc_id AS d,
           |    length(regexp_extract_all(text, '\S+')) AS nt
           |  FROM documents),
           |tok AS (
           |  SELECT source AS s, doc_id AS d,
           |    unnest(regexp_extract_all(text, '\S+')) AS t
           |  FROM documents),
           |fs AS (SELECT s, t, min(d) AS fd FROM tok GROUP BY 1, 2),
           |nv AS (SELECT s, fd AS d, count(*) AS nv
           |       FROM fs GROUP BY 1, 2),
           |pts AS (
           |  SELECT nd.s, nd.d,
           |    sum(nd.nt) OVER (PARTITION BY nd.s ORDER BY nd.d
           |      ROWS UNBOUNDED PRECEDING) AS cn,
           |    sum(coalesce(nv.nv, 0)) OVER (PARTITION BY nd.s
           |      ORDER BY nd.d ROWS UNBOUNDED PRECEDING) AS cv
           |  FROM nd LEFT JOIN nv ON nv.s = nd.s AND nv.d = nd.d),
           |p2 AS (
           |  SELECT s, ln(cn::DOUBLE) AS x, ln(cv::DOUBLE) AS y,
           |    cn, cv
           |  FROM pts WHERE cn > 0 AND cv > 0),
           |a AS (
           |  SELECT s, count(*)::BIGINT AS n_docs,
           |    max(cn)::BIGINT AS n_tokens, max(cv)::BIGINT AS vocab,
           |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
           |    sum(y * y) AS syy, sum(x * y) AS sxy
           |  FROM p2 GROUP BY 1),
           |f AS (
           |  SELECT s, n_docs, n_tokens, vocab,
           |    (sxy - sx * sy / n_docs) /
           |      nullif(sxx - sx * sx / n_docs, 0) AS beta,
           |    sxx - sx * sx / n_docs AS vx,
           |    syy - sy * sy / n_docs AS vy,
           |    sxy - sx * sy / n_docs AS cxy, sx, sy
           |  FROM a)
           |SELECT s AS source, n_docs, n_tokens, vocab,
           |  round(beta, 4) AS beta,
           |  round(exp((sy - beta * sx) / n_docs), 4) AS k,
           |  round(cxy * cxy / nullif(vx * vy, 0), 4) AS r2
           |FROM f ORDER BY source""".stripMargin))

  /** X225: Mann–Kendall trend TEST of the daily count per type —
    * q323's slope upgraded with tie-corrected variance and a normal
    * p-value (Simpson-integrated independent oracle, the q14
    * discipline). */
  private val q334 = Q("q334_mann_kendall",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type",
          datediff(to_date($"ts"), lit("2024-01-01")).as("day"))
        .agg(count(lit(1)).as("y"))
      graft.ml.TrendStats.mannKendallTest(daily, "event_type",
        "day", "y").orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, date_diff('day',
           |      DATE '2024-01-01', ts::DATE)::DOUBLE AS t,
           |    count(*)::DOUBLE AS x
           |  FROM events WHERE ts IS NOT NULL
           |  GROUP BY event_type, ts::DATE),
           |s AS (
           |  SELECT a.g, sum(sign(b.x - a.x)) AS s
           |  FROM d a JOIN d b ON a.g = b.g AND a.t < b.t GROUP BY 1),
           |ties AS (
           |  SELECT g, sum(c) AS n, sum(c * (c - 1) * (2 * c + 5))
           |    AS tt
           |  FROM (SELECT g, x, count(*) AS c FROM d GROUP BY 1, 2)
           |  GROUP BY 1),
           |st AS (
           |  SELECT ties.g, n, s,
           |    (n * (n - 1.0) * (2 * n + 5) - tt) / 18.0 AS vs
           |  FROM ties JOIN s USING (g)),
           |z AS (
           |  SELECT g, n, s, vs,
           |    CASE WHEN s > 0 THEN (s - 1) / sqrt(vs)
           |         WHEN s < 0 THEN (s + 1) / sqrt(vs)
           |         ELSE 0 END AS z
           |  FROM st),
           |grid AS (SELECT g, abs(z) AS az,
           |           unnest(generate_series(0, 20000)) AS i
           |         FROM z),
           |pts AS (SELECT g, az * i / 20000 AS xx,
           |          CASE WHEN i = 0 OR i = 20000 THEN 1
           |               WHEN i % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          az / 20000 AS h
           |        FROM grid),
           |ig AS (SELECT g, sum(wt * exp(-xx * xx / 2)) * max(h)
           |         / 3.0 / sqrt(2 * pi()) AS phi
           |       FROM pts GROUP BY 1)
           |SELECT z.g AS event_type, n::BIGINT AS n, s::BIGINT AS s,
           |  round(vs, 4) AS var_s, round(z, 4) AS z,
           |  round(1.0 - 2.0 * phi, 6) AS p_value
           |FROM z JOIN ig USING (g) ORDER BY event_type""".stripMargin))

  /** X226: spectral entropy of the daily count per type — the
    * forecastability screen over the full Fourier spectrum. */
  private val q335 = Q("q335_spectral_entropy",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).cast("double").as("c"))
      graft.events.Spectral.spectralEntropy(daily, "event_type",
        "d", "c").orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, ts::DATE AS b,
           |    count(*)::DOUBLE AS x
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |idx AS (
           |  SELECT g, x,
           |    (row_number() OVER (PARTITION BY g ORDER BY b) - 1)
           |      ::DOUBLE AS t,
           |    count(*) OVER (PARTITION BY g) AS n,
           |    avg(x) OVER (PARTITION BY g) AS m
           |  FROM d),
           |wj AS (
           |  SELECT g, t, x - m AS dd, n,
           |    unnest(generate_series(1, n // 2)) AS j
           |  FROM idx WHERE n >= 2),
           |pf AS (
           |  SELECT g, j, max(n) AS n,
           |    power(sum(dd * cos(2 * pi() * t * j / n)), 2) +
           |    power(sum(dd * sin(2 * pi() * t * j / n)), 2) AS p
           |  FROM wj GROUP BY 1, 2),
           |agg AS (
           |  SELECT g, max(n)::BIGINT AS n, count(*)::BIGINT AS n_freq,
           |    sum(p) AS tot,
           |    sum(CASE WHEN p > 0 THEN p * ln(p) END) AS plp
           |  FROM pf GROUP BY 1)
           |SELECT g AS event_type, n, n_freq,
           |  CASE WHEN tot > 0 AND n_freq >= 2
           |    THEN round(ln(tot) - plp / tot, 4) END AS entropy,
           |  CASE WHEN tot > 0 AND n_freq >= 2
           |    THEN round((ln(tot) - plp / tot) / ln(n_freq), 4)
           |  END AS norm_entropy
           |FROM agg ORDER BY event_type""".stripMargin))

  /** X227: Cook's distance top-3 per type on the daily-count trend
    * regression — which days own the q117-style fit. */
  private val q336 = Q("q336_cooks_distance",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type",
          datediff(to_date($"ts"), lit("2024-01-01"))
            .cast("double").as("day"))
        .agg(count(lit(1)).cast("double").as("y"))
      graft.ml.Regression.cooksDistance(daily, "event_type",
        "day", "y", topK = 3)
        .orderBy($"event_type", $"cooks_d".desc, $"day")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, date_diff('day',
           |      DATE '2024-01-01', ts::DATE)::DOUBLE AS x,
           |    count(*)::DOUBLE AS y
           |  FROM events WHERE ts IS NOT NULL
           |  GROUP BY event_type, ts::DATE),
           |st AS (
           |  SELECT g, count(*)::DOUBLE AS n, sum(x) AS sx,
           |    sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy,
           |    sum(y * y) AS syy
           |  FROM d GROUP BY 1),
           |c AS (
           |  SELECT g, n, sx / n AS mx, sy,
           |    sxx - sx * sx / n AS cxx, sxy - sx * sy / n AS cxy,
           |    syy - sy * sy / n AS cyy, sx
           |  FROM st WHERE n >= 3),
           |f AS (
           |  SELECT g, n, mx, cxx,
           |    cxy / nullif(cxx, 0) AS b,
           |    sy / n - cxy / nullif(cxx, 0) * sx / n AS a,
           |    nullif(cyy - cxy / nullif(cxx, 0) * cxy, 0) / (n - 2)
           |      AS mse
           |  FROM c),
           |sc AS (
           |  SELECT d.g, d.x, d.y, d.y - f.a - f.b * d.x AS e,
           |    1 / f.n + (d.x - f.mx) * (d.x - f.mx) /
           |      nullif(f.cxx, 0) AS h,
           |    f.mse
           |  FROM d JOIN f USING (g)),
           |cd AS (
           |  SELECT g, x, y, e, h,
           |    e * e / (2 * mse) * h / ((1 - h) * (1 - h)) AS cd
           |  FROM sc),
           |rk AS (
           |  SELECT *, row_number() OVER (PARTITION BY g
           |    ORDER BY cd DESC, x ASC) AS rn
           |  FROM cd WHERE cd IS NOT NULL)
           |SELECT g AS event_type, x AS day, y,
           |  round(e, 4) AS residual, round(h, 4) AS leverage,
           |  round(cd, 4) AS cooks_d
           |FROM rk WHERE rn <= 3
           |ORDER BY event_type, cooks_d DESC, day""".stripMargin))

  /** X228: empirical-Bayes beta-binomial shrinkage of per-user
    * purchase rates — the learn-the-prior CTR smoother (a 1/1 user
    * reads near the prior, not 100%). */
  private val q337 = Q("q337_eb_shrinkage",
    (s, dir) => {
      import s.implicits._
      graft.ml.Scorecard.ebBetaBinomial(
        t(s, dir, "events").select($"user_id",
          when($"event_type" === "purchase", 1).otherwise(0).as("x")),
        "user_id", "x")
        .orderBy($"user_id")
    },
    Some("""WITH u AS (
           |  SELECT user_id, count(*)::BIGINT AS n,
           |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
           |        END)::BIGINT AS x
           |  FROM events GROUP BY 1),
           |p AS (SELECT avg(x::DOUBLE / n) AS m,
           |        var_pop(x::DOUBLE / n) AS v
           |      FROM u),
           |mo AS (
           |  SELECT m,
           |    CASE WHEN v > 0 AND m * (1 - m) / v > 1
           |      THEN m * (m * (1 - m) / v - 1) END AS alpha,
           |    CASE WHEN v > 0 AND m * (1 - m) / v > 1
           |      THEN (1 - m) * (m * (1 - m) / v - 1) END AS beta
           |  FROM p)
           |SELECT user_id, n, x, round(x::DOUBLE / n, 6) AS raw_rate,
           |  round(alpha, 4) AS alpha, round(beta, 4) AS beta,
           |  round(coalesce((x + alpha) / (n + alpha + beta),
           |    x::DOUBLE / n), 6) AS posterior
           |FROM u CROSS JOIN mo ORDER BY user_id""".stripMargin))

  /** X229: MSTTR-50 lexical diversity per source — fixed-window TTR,
    * the length-robust companion to q248. */
  private val q338 = Q("q338_msttr",
    (s, dir) => {
      import s.implicits._
      graft.text.CorpusStats.msttr(t(s, dir, "documents"),
        "source", "doc_id", "text", segLen = 50)
        .orderBy($"source")
    },
    Some("""WITH tok AS (
           |  SELECT source AS s, doc_id AS d,
           |    generate_subscripts(regexp_extract_all(text, '\S+'), 1)
           |      - 1 AS p,
           |    unnest(regexp_extract_all(text, '\S+')) AS t
           |  FROM documents),
           |segt AS (SELECT s, d, p // 50 AS seg, t, count(*) AS c
           |         FROM tok GROUP BY 1, 2, 3, 4),
           |segs AS (SELECT s, d, seg, count(*) AS types,
           |           sum(c) AS len
           |         FROM segt GROUP BY 1, 2, 3),
           |fl AS (SELECT s, count(*)::BIGINT AS n_segments,
           |         round(sum(types)::DOUBLE / (50 * count(*)), 4)
           |           AS msttr
           |       FROM segs WHERE len = 50 GROUP BY 1),
           |nd AS (SELECT source AS s, count(*)::BIGINT AS n_docs
           |       FROM documents GROUP BY 1)
           |SELECT nd.s AS source, n_docs,
           |  coalesce(n_segments, 0) AS n_segments, msttr
           |FROM nd LEFT JOIN fl USING (s) ORDER BY source""".stripMargin))

  /** X230: Gini decision stump per user cohort — best hour-of-day
    * threshold separating purchases, the CART split scan at value
    * grain. */
  private val q339 = Q("q339_gini_stump",
    (s, dir) => {
      import s.implicits._
      graft.ml.Stump.giniStump(
        t(s, dir, "events").filter($"ts".isNotNull)
          .select(
            pmod($"user_id", lit(4)).cast("int").as("cohort"),
            hour($"ts").cast("long").as("h"),
            when($"event_type" === "purchase", 1).otherwise(0).as("t")),
        "cohort", "h", "t")
        .orderBy($"cohort")
    },
    Some("""WITH e AS (
           |  SELECT (user_id % 4)::INT AS g, hour(ts) AS v,
           |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
           |      AS t
           |  FROM events WHERE ts IS NOT NULL),
           |cells AS (SELECT g, v, count(*) AS c, sum(t) AS p
           |          FROM e GROUP BY 1, 2),
           |sc AS (
           |  SELECT g, v,
           |    sum(c) OVER (PARTITION BY g ORDER BY v
           |      ROWS UNBOUNDED PRECEDING) AS nl,
           |    sum(p) OVER (PARTITION BY g ORDER BY v
           |      ROWS UNBOUNDED PRECEDING) AS pl,
           |    sum(c) OVER (PARTITION BY g) AS n,
           |    sum(p) OVER (PARTITION BY g) AS pt
           |  FROM cells),
           |cand AS (SELECT g, v, n, nl, pl, n - nl AS nr,
           |           pt - pl AS pr, pt
           |         FROM sc WHERE nl < n),
           |gg AS (
           |  SELECT g, v, n,
           |    1 - power(pt::DOUBLE / n, 2)
           |      - power(1 - pt::DOUBLE / n, 2) AS gp,
           |    (nl * (1 - power(pl::DOUBLE / nl, 2)
           |           - power(1 - pl::DOUBLE / nl, 2))
           |     + nr * (1 - power(pr::DOUBLE / nr, 2)
           |           - power(1 - pr::DOUBLE / nr, 2))) / n AS gs,
           |    pl::DOUBLE / nl AS rl, pr::DOUBLE / nr AS rr
           |  FROM cand),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY g
           |         ORDER BY gp - gs DESC, v ASC) AS rn
           |       FROM gg)
           |SELECT g AS cohort, n::BIGINT AS n,
           |  round(gp, 4) AS gini_parent, v AS threshold,
           |  round(rl, 4) AS rate_left, round(rr, 4) AS rate_right,
           |  round(gp - gs, 4) AS gain
           |FROM rk WHERE rn = 1 ORDER BY cohort""".stripMargin))

  /** X231: Breusch–Pagan heteroskedasticity screen of the daily
    * revenue trend per type (Koenker LM; Simpson normal-tail
    * oracle). */
  private val q340 = Q("q340_breusch_pagan",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type",
          datediff(to_date($"ts"), lit("2024-01-01"))
            .cast("double").as("day"))
        .agg(sum($"value").as("y"))
      graft.ml.Regression.breuschPagan(daily, "event_type",
        "day", "y").orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, date_diff('day',
           |      DATE '2024-01-01', ts::DATE)::DOUBLE AS x,
           |    sum(value) AS y
           |  FROM events WHERE ts IS NOT NULL
           |  GROUP BY event_type, ts::DATE),
           |st AS (
           |  SELECT g, count(*)::DOUBLE AS n, sum(x) AS sx,
           |    sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
           |  FROM d GROUP BY 1),
           |f AS (
           |  SELECT g,
           |    (sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0)
           |      AS b,
           |    sy / n - (sxy - sx * sy / n) /
           |      nullif(sxx - sx * sx / n, 0) * sx / n AS a
           |  FROM st),
           |r AS (
           |  SELECT d.g, d.x,
           |    power(d.y - f.a - f.b * d.x, 2) AS u
           |  FROM d JOIN f USING (g)),
           |aux AS (
           |  SELECT g, count(*)::DOUBLE AS n, sum(x) AS sx,
           |    sum(u) AS su, sum(x * x) AS sxx, sum(x * u) AS sxu,
           |    sum(u * u) AS suu
           |  FROM r GROUP BY 1),
           |lm AS (
           |  SELECT g, n,
           |    n * (sxu - sx * su / n) * (sxu - sx * su / n) /
           |      nullif((sxx - sx * sx / n) * (suu - su * su / n), 0)
           |      AS lm
           |  FROM aux),
           |grid AS (SELECT g, sqrt(lm) AS az,
           |           unnest(generate_series(0, 20000)) AS i
           |         FROM lm),
           |pts AS (SELECT g, az * i / 20000 AS xx,
           |          CASE WHEN i = 0 OR i = 20000 THEN 1
           |               WHEN i % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          az / 20000 AS h
           |        FROM grid),
           |ig AS (SELECT g, sum(wt * exp(-xx * xx / 2)) * max(h)
           |         / 3.0 / sqrt(2 * pi()) AS phi
           |       FROM pts GROUP BY 1)
           |SELECT lm.g AS event_type, n::BIGINT AS n,
           |  round(lm, 4) AS lm, round(1.0 - 2.0 * phi, 6) AS p_value
           |FROM lm JOIN ig USING (g)
           |ORDER BY event_type""".stripMargin))

  /** X232: seasonal/trend strength of the daily count per type
    * (Hyndman F-measures over the m = 7 classical decomposition) —
    * "is this series worth a seasonal model", scale-free. */
  private val q341 = Q("q341_seasonal_strength",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).cast("double").as("c"))
      graft.events.Decompose.strength(daily, "event_type", "d", "c",
        m = 7).orderBy($"event_type")
    },
    Some("""WITH s AS (
           |  SELECT event_type, ts::DATE AS d, count(*)::DOUBLE AS c
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |b AS (
           |  SELECT event_type, c,
           |    (row_number() OVER (PARTITION BY event_type ORDER BY d)
           |     - 1)::BIGINT AS idx,
           |    count(*) OVER (PARTITION BY event_type) AS n,
           |    sum(c) OVER (PARTITION BY event_type ORDER BY d
           |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win
           |  FROM s),
           |b2 AS (
           |  SELECT event_type, c, idx, n,
           |    CASE WHEN idx >= 3 AND idx < n - 3
           |         THEN win / 7 END AS trend
           |  FROM b),
           |se AS (SELECT event_type, idx % 7 AS ph,
           |         avg(c - trend) AS sraw
           |       FROM b2 WHERE trend IS NOT NULL GROUP BY 1, 2),
           |ce AS (SELECT event_type, avg(sraw) AS cc
           |       FROM se GROUP BY 1),
           |sea AS (SELECT se.event_type, ph,
           |          round(sraw - cc, 6) AS seasonal
           |        FROM se JOIN ce USING (event_type)),
           |dec AS (
           |  SELECT b2.event_type,
           |    round(b2.trend, 6) AS trend, sea.seasonal,
           |    round(b2.c - b2.trend - sea.seasonal, 6) AS residual
           |  FROM b2 JOIN sea ON sea.event_type = b2.event_type
           |                  AND sea.ph = b2.idx % 7
           |  WHERE b2.trend IS NOT NULL),
           |v AS (
           |  SELECT event_type, count(*)::BIGINT AS n_used,
           |    var_pop(residual) AS vr,
           |    var_pop(seasonal + residual) AS vsr,
           |    var_pop(trend + residual) AS vtr
           |  FROM dec GROUP BY 1)
           |SELECT event_type, n_used,
           |  round(greatest(0, 1 - vr / nullif(vsr, 0)), 4)
           |    AS f_seasonal,
           |  round(greatest(0, 1 - vr / nullif(vtr, 0)), 4)
           |    AS f_trend
           |FROM v ORDER BY event_type""".stripMargin))

  /** X233: second SQL-TVF surface — exact dedup invoked through
    * spark.sql over a corpus with planted duplicates, then a plain
    * SQL rollup over the deduped table (the q284 discipline: the
    * library IS reachable by SQL-first users). */
  private val q342 = Q("q342_sql_tvf_dedup",
    (s, dir) => {
      import s.implicits._
      graft.sql.TableFunctions.register(s)
      val docs = t(s, dir, "documents")
      docs.unionByName(docs.filter($"doc_id" % 7 === 0)
          .withColumn("doc_id", $"doc_id" + 1000000L))
        .createOrReplaceTempView("docs_dedup_tvf")
      s.sql("""SELECT source, count(*) AS n_docs,
              |  sum(n_chars) AS total_chars
              |FROM graft_exact_dedup('docs_dedup_tvf', 'doc_id',
              |                       'text')
              |GROUP BY source ORDER BY source""".stripMargin)
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text, source, n_chars FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000, text, source, n_chars
           |  FROM documents WHERE doc_id % 7 = 0),
           |keep AS (SELECT min(doc_id) AS doc_id FROM corpus
           |         GROUP BY md5(text)),
           |k2 AS (SELECT corpus.* FROM corpus JOIN keep
           |       USING (doc_id))
           |SELECT source, count(*)::BIGINT AS n_docs,
           |  sum(n_chars)::BIGINT AS total_chars
           |FROM k2 GROUP BY 1 ORDER BY source""".stripMargin))

  /** X234: Grubbs outlier test on event values per type — exact
    * t-tail via the reg_inc_beta kernel; Simpson-integrated
    * independent oracle (q14 discipline). */
  private val q343 = Q("q343_grubbs",
    (s, dir) => {
      import s.implicits._
      graft.de.Inference.grubbs(t(s, dir, "events"),
        "event_type", "value").orderBy($"event_type")
    },
    Some("""WITH st AS (
           |  SELECT event_type, count(*)::DOUBLE AS n,
           |    avg(value) AS m, stddev_samp(value) AS sd
           |  FROM events WHERE value IS NOT NULL GROUP BY 1),
           |ok AS (SELECT * FROM st WHERE n >= 3 AND sd > 0),
           |dev AS (
           |  SELECT e.event_type, e.value,
           |    abs(e.value - ok.m) AS dv, ok.n, ok.sd,
           |    row_number() OVER (PARTITION BY e.event_type
           |      ORDER BY abs(e.value - ok.m) DESC, e.value DESC)
           |      AS rn
           |  FROM events e JOIN ok USING (event_type)
           |  WHERE e.value IS NOT NULL),
           |top AS (SELECT event_type, value AS outlier, dv, n, sd
           |        FROM dev WHERE rn = 1),
           |gg AS (
           |  SELECT event_type, n, outlier, dv / sd AS g,
           |    (n - 1) * (n - 1) - n * (dv / sd) * (dv / sd)
           |      AS denom
           |  FROM top),
           |tau AS (
           |  SELECT event_type, n, outlier, g, denom,
           |    CASE WHEN denom > 0
           |      THEN n * (n - 2) * g * g / denom END AS tau2
           |  FROM gg),
           |g2 AS (
           |  SELECT event_type, n, outlier, g, denom, tau2,
           |    (n - 2) / 2.0 AS a,
           |    CASE WHEN denom > 0
           |      THEN sqrt(1 - (n - 2) / ((n - 2) + tau2)) END AS lo
           |  FROM tau),
           |grid AS (SELECT g2.*, unnest(generate_series(0, 20000))
           |           AS i
           |         FROM g2 WHERE denom > 0),
           |pts AS (SELECT event_type, a,
           |          lo + (1.0 - lo) * i / 20000 AS u,
           |          CASE WHEN i = 0 OR i = 20000 THEN 1
           |               WHEN i % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          (1.0 - lo) / 20000 AS h
           |        FROM grid),
           |simpson AS (
           |  SELECT event_type, max(a) AS a,
           |    sum(wt * 2 * exp((a - 1.0) *
           |      ln(greatest(1e-300, 1 - u * u)))) * max(h) / 3.0
           |      AS binc
           |  FROM pts GROUP BY event_type)
           |SELECT g2.event_type, g2.n::BIGINT AS n, g2.outlier,
           |  round(g2.g, 4) AS g,
           |  round(CASE WHEN g2.denom <= 0 THEN 0.0
           |    ELSE least(1.0, g2.n * simpson.binc /
           |      exp(lgamma(simpson.a) + lgamma(0.5)
           |          - lgamma(simpson.a + 0.5))) END, 6) AS p_value
           |FROM g2 LEFT JOIN simpson USING (event_type)
           |ORDER BY g2.event_type""".stripMargin))

  /** X235: Hodges–Lehmann pseudo-median of the daily count per type —
    * the Walsh-average location the signed-rank test inverts to. */
  private val q344 = Q("q344_hodges_lehmann",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).cast("double").as("c"))
      graft.de.RobustStats.hodgesLehmann(daily, "event_type", "c")
        .orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, count(*)::DOUBLE AS v
           |  FROM events WHERE ts IS NOT NULL
           |  GROUP BY event_type, ts::DATE),
           |i AS (SELECT g, v, row_number() OVER (PARTITION BY g
           |        ORDER BY v) AS rn
           |      FROM d),
           |pr AS (SELECT a.g, (a.v + b.v) / 2 AS w
           |       FROM i a JOIN i b ON a.g = b.g AND a.rn <= b.rn),
           |agg AS (SELECT g, count(*)::BIGINT AS n_pairs,
           |          quantile_cont(w, 0.5) AS hl
           |        FROM pr GROUP BY 1),
           |nn AS (SELECT g, count(*)::BIGINT AS n FROM d GROUP BY 1)
           |SELECT nn.g AS event_type, n, n_pairs,
           |  round(hl, 6) AS hl_estimate
           |FROM nn JOIN agg USING (g) ORDER BY event_type""".stripMargin))

  /** X236: Cliff's delta of finished vs open order totals per
    * priority — the ordinal effect size next to q216's p-value,
    * derived exactly from the tie-averaged U. */
  private val q345 = Q("q345_cliffs_delta",
    (s, dir) => {
      import s.implicits._
      graft.de.Inference.cliffsDelta(t(s, dir, "orders"),
        "o_orderpriority", "o_orderstatus", "o_totalprice", "F", "O")
        .orderBy($"o_orderpriority")
    },
    Some("""WITH i AS (
           |  SELECT o_orderpriority AS s, o_orderstatus AS g,
           |    o_totalprice AS v
           |  FROM orders WHERE o_orderstatus IN ('F', 'O')
           |    AND o_totalprice IS NOT NULL),
           |cells AS (SELECT s, g, v, count(*) AS cnt
           |          FROM i GROUP BY 1, 2, 3),
           |pv AS (SELECT s, v, sum(cnt) AS t FROM cells
           |       GROUP BY 1, 2),
           |r AS (SELECT s, v,
           |        2 * coalesce(sum(t) OVER (PARTITION BY s ORDER BY v
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |          0) + t + 1 AS r2
           |      FROM pv),
           |pc AS (
           |  SELECT s,
           |    sum(CASE WHEN g = 'F' THEN cnt ELSE 0 END)::BIGINT
           |      AS n_a,
           |    sum(CASE WHEN g = 'O' THEN cnt ELSE 0 END)::BIGINT
           |      AS n_b,
           |    sum(CASE WHEN g = 'F' THEN cnt * r2 ELSE 0 END) AS r2a
           |  FROM cells JOIN r USING (s, v) GROUP BY 1),
           |d AS (
           |  SELECT s, n_a, n_b,
           |    round((r2a / 2.0 - n_a * (n_a + 1) / 2.0), 1) AS u
           |  FROM pc),
           |dd AS (
           |  SELECT s, n_a, n_b,
           |    round(2.0 * u / nullif((n_a * n_b)::DOUBLE, 0) - 1.0,
           |      4) AS delta,
           |    abs(2.0 * u / nullif((n_a * n_b)::DOUBLE, 0) - 1.0)
           |      AS ad
           |  FROM d)
           |SELECT s AS o_orderpriority, n_a, n_b, delta,
           |  CASE WHEN delta IS NULL THEN NULL
           |       WHEN ad < 0.147 THEN 'negligible'
           |       WHEN ad < 0.33 THEN 'small'
           |       WHEN ad < 0.474 THEN 'medium'
           |       ELSE 'large' END AS magnitude
           |FROM dd ORDER BY o_orderpriority""".stripMargin))

  /** X237: Wilcoxon signed-rank of first-half vs second-half-of-month
    * per-user mean value by cohort — the PAIRED complement to q216
    * (Simpson normal-tail oracle). */
  private val q346 = Q("q346_wilcoxon",
    (s, dir) => {
      import s.implicits._
      val paired = t(s, dir, "events")
        .groupBy(pmod($"user_id", lit(4)).cast("int").as("cohort"),
          $"user_id")
        .agg(avg(when(dayofmonth($"ts") <= 15, $"value")).as("pre"),
          avg(when(dayofmonth($"ts") > 15, $"value")).as("post"))
        .filter($"pre".isNotNull && $"post".isNotNull)
      graft.de.Inference.wilcoxonSignedRank(paired, "cohort",
        "pre", "post").orderBy($"cohort")
    },
    Some("""WITH pm AS (
           |  SELECT (user_id % 4)::INT AS s, user_id,
           |    avg(CASE WHEN day(ts) <= 15 THEN value END) AS pre,
           |    avg(CASE WHEN day(ts) > 15 THEN value END) AS post
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |p2 AS (SELECT s, post - pre AS d, abs(post - pre) AS a
           |       FROM pm WHERE pre IS NOT NULL AND post IS NOT NULL
           |         AND post - pre <> 0),
           |cells AS (SELECT s, a, count(*) AS t,
           |            sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS pos
           |          FROM p2 GROUP BY 1, 2),
           |r AS (SELECT s, a, t, pos,
           |        2 * coalesce(sum(t) OVER (PARTITION BY s ORDER BY a
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |          0) + t + 1 AS r2
           |      FROM cells),
           |agg AS (SELECT s, sum(t)::BIGINT AS n_pairs,
           |          sum(pos * r2) AS w2, sum(t * t * t - t) AS tt
           |        FROM r GROUP BY 1),
           |z AS (
           |  SELECT s, n_pairs, w2 / 2.0 AS wp,
           |    (w2 / 2.0 - n_pairs * (n_pairs + 1) / 4.0) /
           |      nullif(sqrt(n_pairs * (n_pairs + 1.0) *
           |        (2 * n_pairs + 1) / 24.0 - tt / 48.0), 0) AS z
           |  FROM agg),
           |grid AS (SELECT s, abs(z) AS az,
           |           unnest(generate_series(0, 20000)) AS i
           |         FROM z),
           |pts AS (SELECT s, az * i / 20000 AS xx,
           |          CASE WHEN i = 0 OR i = 20000 THEN 1
           |               WHEN i % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          az / 20000 AS h
           |        FROM grid),
           |ig AS (SELECT s, sum(wt * exp(-xx * xx / 2)) * max(h)
           |         / 3.0 / sqrt(2 * pi()) AS phi
           |       FROM pts GROUP BY 1)
           |SELECT z.s AS cohort, n_pairs, round(wp, 1) AS w_plus,
           |  round(z, 4) AS z, round(1.0 - 2.0 * phi, 6) AS p_value
           |FROM z JOIN ig USING (s) ORDER BY cohort""".stripMargin))

  /** X238: Ljung–Box whiteness test (h = 2, exact χ²₂ tail) of the
    * daily count per type — the residual-autocorrelation gate. */
  private val q347 = Q("q347_ljung_box",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).cast("double").as("c"))
      graft.ml.TrendStats.ljungBox2(daily, "event_type", "d", "c")
        .orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, ts::DATE AS b,
           |    count(*)::DOUBLE AS c
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |ctr AS (
           |  SELECT g, b, c - avg(c) OVER (PARTITION BY g) AS dd
           |  FROM d),
           |lagd AS (
           |  SELECT g, dd,
           |    lag(dd, 1) OVER (PARTITION BY g ORDER BY b) AS d1,
           |    lag(dd, 2) OVER (PARTITION BY g ORDER BY b) AS d2
           |  FROM ctr),
           |a AS (
           |  SELECT g, count(*)::DOUBLE AS n,
           |    sum(dd * dd) AS s0, sum(dd * d1) AS s1,
           |    sum(dd * d2) AS s2
           |  FROM lagd GROUP BY 1),
           |q AS (
           |  SELECT g, n,
           |    s1 / nullif(CASE WHEN n > 2 THEN s0 END, 0) AS r1,
           |    s2 / nullif(CASE WHEN n > 2 THEN s0 END, 0) AS r2
           |  FROM a),
           |qq AS (
           |  SELECT g, n, r1, r2,
           |    n * (n + 2) * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2))
           |      AS q
           |  FROM q)
           |SELECT g AS event_type, n::BIGINT AS n,
           |  round(r1, 4) AS r1, round(r2, 4) AS r2,
           |  round(q, 4) AS q, round(exp(-q / 2), 6) AS p_value
           |FROM qq ORDER BY event_type""".stripMargin))

  /** X240: Calinski–Harabasz + Davies–Bouldin clustering validity
    * over the labeled embedding vectors — "is this clustering any
    * good" in two numbers, next to q200's per-point silhouette. */
  private val q348 = Q("q348_cluster_validity",
    (s, dir) =>
      graft.ml.ClusterMetrics.validityIndices(
        t(s, dir, "embeddings"), "vec_id", "label", "embedding"),
    Some("""WITH pts AS (
           |  SELECT vec_id, label,
           |    generate_subscripts(embedding, 1) AS d,
           |    unnest(embedding)::DOUBLE AS x
           |  FROM embeddings),
           |cent AS (SELECT label, d, avg(x) AS m, count(*) AS nk
           |         FROM pts GROUP BY 1, 2),
           |gl AS (SELECT d, avg(x) AS gm FROM pts GROUP BY 1),
           |wss AS (SELECT sum((x - m) * (x - m)) AS w
           |        FROM pts JOIN cent USING (label, d)),
           |bss AS (SELECT sum(nk * (m - gm) * (m - gm)) AS b
           |        FROM cent JOIN gl USING (d)),
           |pd AS (SELECT vec_id, label,
           |         sqrt(sum((x - m) * (x - m))) AS dist
           |       FROM pts JOIN cent USING (label, d)
           |       GROUP BY 1, 2),
           |sk AS (SELECT label, avg(dist) AS s FROM pd GROUP BY 1),
           |cd AS (
           |  SELECT a.label AS la, b.label AS lb,
           |    sqrt(sum((a.m - b.m) * (a.m - b.m))) AS mij
           |  FROM cent a JOIN cent b ON a.d = b.d
           |    AND a.label <> b.label
           |  GROUP BY 1, 2),
           |dbi AS (
           |  SELECT avg(mx) AS db FROM (
           |    SELECT la, max((sa.s + sb.s) / nullif(mij, 0)) AS mx
           |    FROM cd JOIN sk sa ON sa.label = cd.la
           |    JOIN sk sb ON sb.label = cd.lb GROUP BY la)),
           |meta AS (SELECT count(*)::BIGINT AS n,
           |           count(DISTINCT label)::INT AS k
           |         FROM embeddings)
           |SELECT n, k,
           |  CASE WHEN k >= 2 THEN round((b / (k - 1)) /
           |    nullif(w / (n - k), 0), 4) END AS ch_index,
           |  CASE WHEN k >= 2 THEN round(db, 4) END AS db_index
           |FROM meta CROSS JOIN wss CROSS JOIN bss
           |CROSS JOIN dbi""".stripMargin))

  /** X241: Kupiec POF VaR backtest of the daily-revenue 5% tail per
    * type (first half estimates, second half tests; Simpson
    * normal-tail oracle). */
  private val q349 = Q("q349_var_backtest",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(sum($"value").as("v"))
      graft.events.Finance.varBacktest(daily, "event_type", "d", "v",
        p = 0.05).orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, ts::DATE AS b, sum(value) AS v
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |sp AS (
           |  SELECT g, b, v,
           |    row_number() OVER (PARTITION BY g ORDER BY b) AS rn,
           |    count(*) OVER (PARTITION BY g) AS n
           |  FROM d),
           |est AS (SELECT g, count(*)::BIGINT AS n_est,
           |          quantile_cont(v, 0.05) AS vr
           |        FROM sp WHERE rn <= n // 2 GROUP BY 1),
           |tst AS (
           |  SELECT sp.g, max(n_est) AS n_est,
           |    count(*)::BIGINT AS n_test, max(vr) AS vr,
           |    sum(CASE WHEN v < vr THEN 1 ELSE 0 END)::BIGINT AS x
           |  FROM sp JOIN est USING (g) WHERE rn > n // 2
           |  GROUP BY sp.g),
           |lr AS (
           |  SELECT g, n_est, n_test, vr, x,
           |    greatest(0, -2 * ((n_test - x) * ln(0.95)
           |      + x * ln(0.05)
           |      - (CASE WHEN x < n_test THEN (n_test - x) *
           |          ln(1 - x::DOUBLE / n_test) ELSE 0 END)
           |      - (CASE WHEN x > 0 THEN x *
           |          ln(x::DOUBLE / n_test) ELSE 0 END))) AS lr
           |  FROM tst WHERE n_est > 0 AND n_test > 0),
           |grid AS (SELECT g, sqrt(lr) AS az,
           |           unnest(generate_series(0, 20000)) AS i
           |         FROM lr),
           |pts AS (SELECT g, az * i / 20000 AS xx,
           |          CASE WHEN i = 0 OR i = 20000 THEN 1
           |               WHEN i % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          az / 20000 AS h
           |        FROM grid),
           |ig AS (SELECT g, sum(wt * exp(-xx * xx / 2)) * max(h)
           |         / 3.0 / sqrt(2 * pi()) AS phi
           |       FROM pts GROUP BY 1)
           |SELECT lr.g AS event_type, n_est, n_test,
           |  round(vr, 4) AS var_est, x AS n_violations,
           |  round(x::DOUBLE / n_test, 4) AS rate,
           |  round(lr, 4) AS lr_pof,
           |  round(1.0 - 2.0 * phi, 6) AS p_value
           |FROM lr JOIN ig USING (g) ORDER BY event_type""".stripMargin))

  /** X242: newsvendor optimal stock from the empirical daily-demand
    * distribution per type (c_u = 4, c_o = 1 → critical ratio 0.8). */
  private val q350 = Q("q350_newsvendor",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).cast("double").as("demand"))
      graft.report.Inventory.newsvendor(daily, "event_type",
        "demand", cu = 4.0, co = 1.0).orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, count(*)::DOUBLE AS dem
           |  FROM events WHERE ts IS NOT NULL
           |  GROUP BY event_type, ts::DATE),
           |q AS (SELECT g, count(*)::BIGINT AS n,
           |        quantile_cont(dem, 0.8) AS qo
           |      FROM d GROUP BY 1),
           |e AS (
           |  SELECT d.g, max(n) AS n, max(qo) AS qo,
           |    avg(greatest(dem - qo, 0)) AS und,
           |    avg(greatest(qo - dem, 0)) AS ovr
           |  FROM d JOIN q USING (g) GROUP BY d.g)
           |SELECT g AS event_type, n, 0.8::DOUBLE AS critical_ratio,
           |  round(qo, 4) AS q_opt, round(und, 4) AS exp_underage,
           |  round(ovr, 4) AS exp_overage,
           |  round(4 * und + 1 * ovr, 4) AS exp_cost
           |FROM e ORDER BY event_type""".stripMargin))

  /** X243: Granger causality (lag 1) — do daily clicks predict daily
    * purchases beyond purchase history (exact F-tail via
    * reg_inc_beta; Simpson t oracle)? */
  private val q351 = Q("q351_granger",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy(to_date($"ts").as("d"))
        .agg(sum(when($"event_type" === "click", 1).otherwise(0))
          .as("x"),
          sum(when($"event_type" === "purchase", 1).otherwise(0))
            .as("y"))
        .withColumn("k", lit("all"))
      graft.ml.Regression.grangerLag1(daily, "k", "d", "x", "y")
    },
    Some("""WITH d AS (
           |  SELECT ts::DATE AS b,
           |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
           |        END)::DOUBLE AS x,
           |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
           |        END)::DOUBLE AS y
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
           |lg AS (
           |  SELECT y, lag(y) OVER (ORDER BY b) AS y1,
           |    lag(x) OVER (ORDER BY b) AS x1
           |  FROM d),
           |l2 AS (SELECT * FROM lg WHERE y1 IS NOT NULL
           |       AND x1 IS NOT NULL AND y IS NOT NULL),
           |a AS (
           |  SELECT count(*)::DOUBLE AS n, sum(y1) AS s1,
           |    sum(x1) AS s2, sum(y) AS sy, sum(y1 * y1) AS s11,
           |    sum(x1 * x1) AS s22, sum(y1 * x1) AS s12,
           |    sum(y1 * y) AS s1y, sum(x1 * y) AS s2y,
           |    sum(y * y) AS syy
           |  FROM l2),
           |c AS (
           |  SELECT n, s11 - s1 * s1 / n AS c11,
           |    s22 - s2 * s2 / n AS c22, s12 - s1 * s2 / n AS c12,
           |    s1y - s1 * sy / n AS c1y, s2y - s2 * sy / n AS c2y,
           |    syy - sy * sy / n AS cyy
           |  FROM a),
           |f AS (
           |  SELECT n, cyy, c1y * c1y / nullif(c11, 0) AS expl_r,
           |    ((c1y * c22 - c2y * c12) * c1y +
           |     (c2y * c11 - c1y * c12) * c2y) /
           |      nullif(c11 * c22 - c12 * c12, 0) AS expl_u
           |  FROM c),
           |ff AS (
           |  SELECT n, cyy, cyy - expl_r AS rss_r,
           |    cyy - expl_u AS rss_u,
           |    ((cyy - expl_r) - (cyy - expl_u)) /
           |      (nullif(cyy - expl_u, 0) / (n - 3)) AS fstat
           |  FROM f),
           |g2 AS (
           |  SELECT n, cyy, rss_r, rss_u, fstat,
           |    (n - 3) / 2.0 AS aa,
           |    sqrt(1 - (n - 3) / ((n - 3) + fstat)) AS lo
           |  FROM ff),
           |grid AS (SELECT g2.*, unnest(generate_series(0, 20000))
           |           AS i
           |         FROM g2),
           |pts AS (SELECT aa, lo + (1.0 - lo) * i / 20000 AS u,
           |          CASE WHEN i = 0 OR i = 20000 THEN 1
           |               WHEN i % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          (1.0 - lo) / 20000 AS h
           |        FROM grid),
           |simpson AS (
           |  SELECT max(aa) AS aa,
           |    sum(wt * 2 * exp((aa - 1.0) *
           |      ln(greatest(1e-300, 1 - u * u)))) * max(h) / 3.0
           |      AS binc
           |  FROM pts)
           |SELECT 'all' AS k, g2.n::BIGINT AS n,
           |  round(1.0 - rss_r / nullif(cyy, 0), 4)
           |    AS r2_restricted,
           |  round(1.0 - rss_u / nullif(cyy, 0), 4)
           |    AS r2_unrestricted,
           |  round(fstat, 4) AS f,
           |  round(simpson.binc / exp(lgamma(simpson.aa)
           |    + lgamma(0.5) - lgamma(simpson.aa + 0.5)), 6)
           |    AS p_value
           |FROM g2 CROSS JOIN simpson""".stripMargin))

  /** X244: position-based (U-shaped 40/20/40) multi-touch
    * attribution — the third classic next to q125 last-touch and
    * q140 linear, same banded range join. */
  private val q352 = Q("q352_position_attribution",
    (s, dir) =>
      graft.events.Attribution.positionBased(t(s, dir, "events"),
        "user_id", "ts", "event_type", "event_id", "purchase",
        Seq("click", "signup", "view"), lookbackSec = 86400L),
    Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tsu
           |           FROM events WHERE event_type = 'purchase'),
           |t AS (SELECT event_id AS tid, user_id, epoch_us(ts) AS tsu,
           |        event_type
           |      FROM events
           |      WHERE event_type IN ('click', 'signup', 'view')),
           |j AS (SELECT p.event_id AS cid, t.event_type AS touch,
           |        t.tsu, t.tid
           |      FROM p JOIN t ON t.user_id = p.user_id
           |        AND t.tsu <= p.tsu
           |        AND t.tsu >= p.tsu - 86400000000),
           |r AS (SELECT cid, touch,
           |        count(*) OVER (PARTITION BY cid) AS k,
           |        row_number() OVER (PARTITION BY cid
           |          ORDER BY tsu, tid) AS rn
           |      FROM j),
           |w AS (SELECT touch,
           |        CASE WHEN k = 1 THEN 1.0
           |             WHEN k = 2 THEN 0.5
           |             WHEN rn = 1 THEN 0.4
           |             WHEN rn = k THEN 0.4
           |             ELSE 0.2 / (k - 2) END AS wt
           |      FROM r),
           |att AS (SELECT touch, round(sum(wt), 4) AS credit,
           |          count(*)::BIGINT AS n_touches
           |        FROM w GROUP BY 1),
           |una AS (SELECT 'unattributed' AS touch,
           |          round(count(*) * 1.0, 4) AS credit,
           |          0::BIGINT AS n_touches
           |        FROM p WHERE NOT EXISTS
           |          (SELECT 1 FROM j WHERE j.cid = p.event_id)
           |        HAVING count(*) > 0)
           |SELECT * FROM att UNION ALL SELECT * FROM una
           |ORDER BY touch""".stripMargin))

  /** X245: pinball-loss quantile-forecast evaluation — the first
    * half's P10/P50/P90 of daily revenue scored on the second half,
    * with empirical coverage as the calibration readout. */
  private val q353 = Q("q353_pinball",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(sum($"value").as("v"))
      graft.ml.Ranking.quantileForecastEval(daily, "event_type",
        "d", "v", Seq(0.1, 0.5, 0.9))
        .orderBy($"event_type", $"q")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, ts::DATE AS b, sum(value) AS v
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |sp AS (
           |  SELECT g, b, v,
           |    row_number() OVER (PARTITION BY g ORDER BY b) AS rn,
           |    count(*) OVER (PARTITION BY g) AS n
           |  FROM d),
           |fc AS (
           |  SELECT g, 0.1 AS q, quantile_cont(v, 0.1) AS f
           |  FROM sp WHERE rn <= n // 2 GROUP BY g
           |  UNION ALL
           |  SELECT g, 0.5, quantile_cont(v, 0.5)
           |  FROM sp WHERE rn <= n // 2 GROUP BY g
           |  UNION ALL
           |  SELECT g, 0.9, quantile_cont(v, 0.9)
           |  FROM sp WHERE rn <= n // 2 GROUP BY g)
           |SELECT sp.g AS event_type, round(fc.q, 2)::DOUBLE AS q,
           |  count(*)::BIGINT AS n_test,
           |  round(max(fc.f), 4) AS forecast,
           |  round(sum(round(fc.q * greatest(sp.v - fc.f, 0) +
           |    (1 - fc.q) * greatest(fc.f - sp.v, 0), 4)) * 10000)
           |    / (10000 * count(*)) AS pinball,
           |  round(avg(CASE WHEN sp.v <= fc.f THEN 1.0 ELSE 0.0
           |        END), 4) AS coverage
           |FROM sp JOIN fc USING (g) WHERE rn > n // 2
           |GROUP BY sp.g, fc.q
           |ORDER BY event_type, q""".stripMargin))

  /** X246: Kendall's W — do the 5 user cohorts agree on the ranking
    * of event types by mean value? */
  private val q354 = Q("q354_kendalls_w",
    (s, dir) => {
      import s.implicits._
      graft.de.RankStats.kendallsW(
        t(s, dir, "events").select(
          pmod($"user_id", lit(5)).cast("int").as("rater"),
          $"event_type", $"value"),
        "rater", "event_type", "value")
    },
    Some("""WITH cell AS (
           |  -- operator contract: null item/value rows are dropped
           |  -- (fuzz-25; the correlated c2.i = cell.i below would
           |  -- silently drop a NULL item anyway — the q163 class)
           |  SELECT (user_id % 5)::INT AS r, event_type AS i,
           |    avg(value) AS v
           |  FROM events
           |  WHERE event_type IS NOT NULL AND value IS NOT NULL
           |  GROUP BY 1, 2),
           |m AS (SELECT count(DISTINCT r) AS m FROM cell),
           |comp AS (
           |  SELECT cell.* FROM cell, m
           |  WHERE (SELECT count(*) FROM cell c2 WHERE c2.i = cell.i)
           |    = m.m),
           |pv AS (SELECT r, v, count(*) AS c FROM comp GROUP BY 1, 2),
           |rk AS (
           |  SELECT r, v, coalesce(sum(c) OVER (PARTITION BY r
           |      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
           |      1 PRECEDING), 0) + (c + 1) / 2.0 AS rnk
           |  FROM pv),
           |isum AS (
           |  SELECT i, sum(rnk) AS rs
           |  FROM comp JOIN rk USING (r, v) GROUP BY 1),
           |ties AS (SELECT sum(c * c * c - c) AS tt FROM pv),
           |agg AS (
           |  SELECT count(*)::DOUBLE AS n, sum(rs) AS sm,
           |    sum(rs * rs) AS sq
           |  FROM isum),
           |w AS (
           |  SELECT m.m, agg.n, sq - sm * sm / n AS sdev,
           |    12.0 * (sq - sm * sm / n) /
           |      nullif(m.m * m.m * (n * n * n - n) - m.m * tt, 0)
           |      AS w
           |  FROM agg CROSS JOIN m CROSS JOIN ties)
           |SELECT m::INT AS m, n::BIGINT AS n, round(sdev, 4) AS s,
           |  round(w, 4) AS w, round(m * (n - 1) * w, 4) AS chi2
           |FROM w""".stripMargin))

  /** X247: nearest-neighbor covariate matching ATT per type — does
    * the odd-user "treatment" shift hour-of-day at matched spend
    * levels? Sorted union sweep, no pairwise join. */
  private val q355 = Q("q355_nn_matching",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.nnMatchedAtt(
        t(s, dir, "events").select($"event_type",
          pmod($"user_id", lit(2)).cast("int").as("treat"),
          $"value", hour($"ts").cast("double").as("y")),
        "event_type", "treat", "value", "y")
        .orderBy($"event_type")
    },
    Some("""WITH b AS (
           |  -- complete-case on the covariate: the operator drops
           |  -- null-x rows upfront; without this a fuzzed null value
           |  -- inflates the counts AND (nulls sort last) hands the
           |  -- tail treated rows a spurious nearest control (fuzz-20)
           |  SELECT event_type AS s, (user_id % 2)::INT AS t,
           |    value AS x, hour(ts)::DOUBLE AS y
           |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
           |sw AS (
           |  SELECT s, t, x, y,
           |    last_value(CASE WHEN t = 0 THEN x END IGNORE NULLS)
           |      OVER (PARTITION BY s ORDER BY x, t, y
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS px,
           |    last_value(CASE WHEN t = 0 THEN y END IGNORE NULLS)
           |      OVER (PARTITION BY s ORDER BY x, t, y
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS py,
           |    last_value(CASE WHEN t = 0 THEN x END IGNORE NULLS)
           |      OVER (PARTITION BY s ORDER BY x DESC, t DESC, y DESC
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS nx,
           |    last_value(CASE WHEN t = 0 THEN y END IGNORE NULLS)
           |      OVER (PARTITION BY s ORDER BY x DESC, t DESC, y DESC
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS ny
           |  FROM b),
           |mt AS (
           |  SELECT s,
           |    y - (CASE WHEN nx IS NULL OR (px IS NOT NULL AND
           |          abs(x - px) <= abs(x - nx)) THEN py ELSE ny END)
           |      AS eff,
           |    CASE WHEN nx IS NULL OR (px IS NOT NULL AND
           |          abs(x - px) <= abs(x - nx))
           |      THEN abs(x - px) ELSE abs(x - nx) END AS dist
           |  FROM sw WHERE t = 1
           |    AND (px IS NOT NULL OR nx IS NOT NULL)),
           |cnt AS (
           |  SELECT s,
           |    sum(CASE WHEN t = 1 THEN 1 ELSE 0 END)::BIGINT
           |      AS n_treated,
           |    sum(CASE WHEN t = 0 THEN 1 ELSE 0 END)::BIGINT
           |      AS n_controls
           |  FROM b GROUP BY 1)
           |SELECT cnt.s AS event_type, n_treated, n_controls,
           |  round(avg(eff), 4) AS att,
           |  round(avg(dist), 4) AS avg_match_dist
           |FROM cnt JOIN mt USING (s)
           |GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin))

  /** X248: rank-biased overlap of supplier revenue leaderboards,
    * 1995-97 vs 1998+ per nation — the top-weighted "did the
    * leaderboard change" measure (truncated RBO, D = 10, p = 0.9). */
  private val q356 = Q("q356_rbo",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").join(t(s, dir, "supplier"),
          $"l_suppkey" === $"s_suppkey")
        .join(t(s, dir, "nation"), $"s_nationkey" === $"n_nationkey")
        .select($"n_name", $"s_suppkey",
          (year($"l_shipdate") < 1998).as("h1"),
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      val pivoted = li.groupBy($"n_name", $"s_suppkey")
        .agg(sum(when($"h1", $"rev")).as("ra_rev"),
          sum(when(!$"h1", $"rev")).as("rb_rev"))
        .filter($"ra_rev".isNotNull && $"rb_rev".isNotNull)
      val wA = org.apache.spark.sql.expressions.Window
        .partitionBy($"n_name")
        .orderBy($"ra_rev".desc, $"s_suppkey".asc)
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy($"n_name")
        .orderBy($"rb_rev".desc, $"s_suppkey".asc)
      val ranked = pivoted
        .withColumn("ra", row_number().over(wA))
        .withColumn("rb", row_number().over(wB))
      graft.ml.Ranking.rbo(ranked, "n_name", "ra", "rb",
        depth = 10, p = 0.9).orderBy($"n_name")
    },
    Some("""WITH li AS (
           |  SELECT n_name, s_suppkey,
           |    year(l_shipdate) < 1998 AS h1,
           |    l_extendedprice * (1.0 - l_discount) AS rev
           |  FROM lineitem
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation ON s_nationkey = n_nationkey),
           |pv AS (
           |  SELECT n_name, s_suppkey,
           |    sum(CASE WHEN h1 THEN rev END) AS ra_rev,
           |    sum(CASE WHEN NOT h1 THEN rev END) AS rb_rev
           |  FROM li GROUP BY 1, 2),
           |p2 AS (SELECT * FROM pv WHERE ra_rev IS NOT NULL
           |       AND rb_rev IS NOT NULL),
           |rk AS (
           |  SELECT n_name,
           |    row_number() OVER (PARTITION BY n_name
           |      ORDER BY ra_rev DESC, s_suppkey ASC) AS ra,
           |    row_number() OVER (PARTITION BY n_name
           |      ORDER BY rb_rev DESC, s_suppkey ASC) AS rb
           |  FROM p2),
           |dep AS (SELECT unnest(generate_series(1, 10)) AS d),
           |ov AS (
           |  SELECT n_name, d, count(*) AS ovl
           |  FROM rk CROSS JOIN dep
           |  WHERE ra <= d AND rb <= d GROUP BY 1, 2),
           |nn AS (SELECT n_name, count(*)::BIGINT AS n_items
           |       FROM rk GROUP BY 1),
           |rb2 AS (
           |  SELECT n_name,
           |    round(sum(power(0.9, d - 1) * ovl / d) * 0.1, 4)
           |      AS rbo
           |  FROM ov GROUP BY 1)
           |SELECT nn.n_name, n_items, coalesce(rbo, 0.0) AS rbo
           |FROM nn LEFT JOIN rb2 USING (n_name)
           |ORDER BY n_name""".stripMargin))

  /** X249: term burstiness (Fano factor of per-doc counts, zeros
    * included via sufficient sums) — boilerplate-block screen. */
  private val q357 = Q("q357_term_burstiness",
    (s, dir) =>
      graft.text.CorpusStats.termBurstiness(t(s, dir, "documents"),
        "doc_id", "text", minDf = 5L, topK = 20),
    Some("""WITH pd AS (
           |  SELECT doc_id, t, count(*) AS c
           |  FROM (SELECT doc_id,
           |          unnest(regexp_extract_all(text, '\S+')) AS t
           |        FROM documents)
           |  GROUP BY 1, 2),
           |pt AS (SELECT t, count(*) AS df, sum(c) AS total,
           |         sum(c * c) AS s2
           |       FROM pd GROUP BY 1),
           |nn AS (SELECT count(*)::DOUBLE AS n FROM documents)
           |SELECT t AS term, df::BIGINT AS df, total::BIGINT AS total,
           |  round(total / n, 6) AS mean_per_doc,
           |  round((s2 / n - (total / n) * (total / n)) /
           |    nullif(total / n, 0), 4) AS vmr
           |FROM pt CROSS JOIN nn WHERE df >= 5
           |ORDER BY vmr DESC, term ASC LIMIT 20""".stripMargin))

  /** X250: Anderson–Darling + Cramér–von Mises normality battery
    * (estimated parameters, Stephens 5% criticals) over the daily
    * counts per type — per-row Φ Simpson-integrated in the oracle. */
  private val q358 = Q("q358_normality_battery",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).cast("double").as("c"))
      graft.de.Gof.normalityBattery(daily, "event_type", "c")
        .orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, ts::DATE AS b,
           |    count(*)::DOUBLE AS v
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |st AS (
           |  SELECT g, count(*)::DOUBLE AS n, avg(v) AS m,
           |    stddev_samp(v) AS sd
           |  FROM d GROUP BY 1),
           |ok AS (SELECT * FROM st WHERE n >= 5 AND sd > 0),
           |rk AS (
           |  SELECT d.g, (v - m) / sd AS z,
           |    row_number() OVER (PARTITION BY d.g ORDER BY v)
           |      ::DOUBLE AS i,
           |    n
           |  FROM d JOIN ok USING (g)),
           |gr AS (SELECT g, z, i, n, abs(z) AS az,
           |         unnest(generate_series(0, 2000)) AS j
           |       FROM rk),
           |pts AS (SELECT g, i, az * j / 2000 AS xx,
           |          CASE WHEN j = 0 OR j = 2000 THEN 1
           |               WHEN j % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          az / 2000 AS h
           |        FROM gr),
           |ig AS (SELECT g, i, sum(wt * exp(-xx * xx / 2)) * max(h)
           |         / 3.0 / sqrt(2 * pi()) AS integ
           |       FROM pts GROUP BY 1, 2),
           |ph AS (
           |  SELECT rk.g, rk.i, rk.n,
           |    CASE WHEN rk.z >= 0 THEN 0.5 + integ
           |         ELSE 0.5 - integ END AS phi
           |  FROM rk JOIN ig ON ig.g = rk.g AND ig.i = rk.i),
           |terms AS (
           |  SELECT g, n,
           |    (2 * i - 1) * ln(greatest(1e-300, phi)) +
           |    (2 * (n - i) + 1) * ln(greatest(1e-300, 1 - phi))
           |      AS adt,
           |    (phi - (2 * i - 1) / (2 * n)) *
           |    (phi - (2 * i - 1) / (2 * n)) AS cvt
           |  FROM ph),
           |agg AS (SELECT g, max(n) AS n, sum(adt) AS sad,
           |          sum(cvt) AS scv
           |        FROM terms GROUP BY 1),
           |fin AS (
           |  SELECT g, n,
           |    (-n - sad / n) * (1 + 0.75 / n + 2.25 / (n * n))
           |      AS a2s,
           |    (scv + 1 / (12 * n)) * (1 + 0.5 / n) AS w2s
           |  FROM agg)
           |SELECT g AS event_type, n::BIGINT AS n,
           |  round(a2s, 4) AS a2_star, a2s > 0.752 AS ad_reject_5pct,
           |  round(w2s, 4) AS w2_star, w2s > 0.126 AS cvm_reject_5pct
           |FROM fin ORDER BY event_type""".stripMargin))

  /** X251: exact rank-based two-sample Anderson–Darling of finished
    * vs open order totals per priority — the tail-sensitive
    * complement to q144's KS (asymptotic-variance normal tail,
    * documented; Simpson oracle). */
  private val q359 = Q("q359_ad_two_sample",
    (s, dir) => {
      import s.implicits._
      graft.de.Gof.adTwoSample(t(s, dir, "orders"),
        "o_orderpriority", "o_orderstatus", "o_totalprice", "F", "O")
        .orderBy($"o_orderpriority")
    },
    Some("""WITH i AS (
           |  SELECT o_orderpriority AS s, o_orderstatus AS g,
           |    o_totalprice AS v
           |  FROM orders WHERE o_orderstatus IN ('F', 'O')
           |    AND o_totalprice IS NOT NULL),
           |cells AS (
           |  SELECT s, v,
           |    sum(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS la,
           |    count(*) AS l
           |  FROM i GROUP BY 1, 2),
           |sw AS (
           |  SELECT s, l, la,
           |    sum(l) OVER (PARTITION BY s ORDER BY v
           |      ROWS UNBOUNDED PRECEDING) AS bb,
           |    sum(la) OVER (PARTITION BY s ORDER BY v
           |      ROWS UNBOUNDED PRECEDING) AS ma,
           |    sum(l) OVER (PARTITION BY s) AS nn,
           |    sum(la) OVER (PARTITION BY s) AS mm
           |  FROM cells),
           |tm AS (
           |  SELECT s, max(nn)::DOUBLE AS nn, max(mm)::DOUBLE AS mm,
           |    sum(CASE WHEN (bb - l / 2.0) * (nn - bb + l / 2.0)
           |               - nn * l / 4.0 > 0
           |        THEN l * (nn * (ma - la / 2.0) -
           |             mm * (bb - l / 2.0)) *
           |             (nn * (ma - la / 2.0) - mm * (bb - l / 2.0)) /
           |             ((bb - l / 2.0) * (nn - bb + l / 2.0)
           |              - nn * l / 4.0)
           |        ELSE 0 END) AS t
           |  FROM sw GROUP BY 1),
           |ok AS (SELECT * FROM tm WHERE mm > 0 AND mm < nn),
           |zz AS (
           |  SELECT s, mm, nn, t / (mm * (nn - mm)) AS a2,
           |    (t / (mm * (nn - mm)) - 1.0) /
           |      sqrt(2.0 * (pi() * pi() - 9) / 3) AS z
           |  FROM ok),
           |grid AS (SELECT s, abs(z) AS az,
           |           unnest(generate_series(0, 20000)) AS j
           |         FROM zz),
           |pts AS (SELECT s, az * j / 20000 AS xx,
           |          CASE WHEN j = 0 OR j = 20000 THEN 1
           |               WHEN j % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          az / 20000 AS h
           |        FROM grid),
           |ig AS (SELECT s, sum(wt * exp(-xx * xx / 2)) * max(h)
           |         / 3.0 / sqrt(2 * pi()) AS integ
           |       FROM pts GROUP BY 1)
           |SELECT zz.s AS o_orderpriority, mm::BIGINT AS n_a,
           |  (nn - mm)::BIGINT AS n_b, round(a2, 4) AS a2,
           |  round(z, 4) AS z,
           |  round(CASE WHEN z >= 0 THEN 0.5 - integ
           |        ELSE 0.5 + integ END, 6) AS p_value
           |FROM zz JOIN ig ON zz.s IS NOT DISTINCT FROM ig.s
           |ORDER BY o_orderpriority""".stripMargin))

  /** X252: GPD tail fit by method of moments over the 95%-threshold
    * exceedances of event values per type — "how heavy is the tail"
    * (ξ > 0 = heavy), the EVT readout central moments can't give. */
  private val q360 = Q("q360_gpd_tail",
    (s, dir) => {
      import s.implicits._
      graft.de.Evt.gpdTail(t(s, dir, "events"), "event_type",
        "value", q = 0.95).orderBy($"event_type")
    },
    Some("""WITH thr AS (
           |  SELECT event_type, count(*)::BIGINT AS n,
           |    quantile_cont(value, 0.95) AS u
           |  FROM events WHERE value IS NOT NULL GROUP BY 1),
           |exa AS (
           |  SELECT e.event_type, count(*)::BIGINT AS n_exceed,
           |    avg(e.value - u) AS me, var_pop(e.value - u) AS ve
           |  FROM events e JOIN thr USING (event_type)
           |  WHERE e.value > u GROUP BY 1),
           |ex AS (
           |  SELECT thr.event_type, thr.n, thr.u,
           |    coalesce(n_exceed, 0)::BIGINT AS n_exceed, me, ve
           |  FROM thr LEFT JOIN exa USING (event_type)),
           |r AS (
           |  SELECT *, me * me / nullif(CASE WHEN n_exceed >= 2
           |      THEN ve END, 0) AS ratio
           |  FROM ex)
           |SELECT event_type, n, round(u, 4) AS threshold, n_exceed,
           |  round(me, 4) AS mean_excess,
           |  round(0.5 * (1 - ratio), 4) AS xi,
           |  round(0.5 * me * (1 + ratio), 4) AS sigma
           |FROM r ORDER BY event_type""".stripMargin))

  /** X253: Bland–Altman limits of agreement between each user's
    * first-half and second-half mean value, by cohort — the method-
    * agreement readout correlation cannot give. */
  private val q361 = Q("q361_bland_altman",
    (s, dir) => {
      import s.implicits._
      val paired = t(s, dir, "events")
        .groupBy(pmod($"user_id", lit(4)).cast("int").as("cohort"),
          $"user_id")
        .agg(avg(when(dayofmonth($"ts") <= 15, $"value")).as("a"),
          avg(when(dayofmonth($"ts") > 15, $"value")).as("b"))
        .filter($"a".isNotNull && $"b".isNotNull)
      graft.de.Agreement.blandAltman(paired, "cohort", "a", "b")
        .orderBy($"cohort")
    },
    Some("""WITH pm AS (
           |  SELECT (user_id % 4)::INT AS g, user_id,
           |    avg(CASE WHEN day(ts) <= 15 THEN value END) AS a,
           |    avg(CASE WHEN day(ts) > 15 THEN value END) AS b
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |p2 AS (SELECT g, b - a AS d FROM pm
           |       WHERE a IS NOT NULL AND b IS NOT NULL),
           |st AS (SELECT g, count(*)::BIGINT AS n, avg(d) AS m,
           |         stddev_samp(d) AS sd
           |       FROM p2 GROUP BY 1)
           |SELECT st.g AS cohort, n, round(m, 4) AS bias,
           |  round(sd, 4) AS sd_diff,
           |  round(m - 1.959964 * sd, 4) AS loa_lo,
           |  round(m + 1.959964 * sd, 4) AS loa_hi,
           |  round(avg(CASE WHEN d < m - 1.959964 * sd
           |             OR d > m + 1.959964 * sd
           |        THEN 1.0 ELSE 0.0 END), 4) AS pct_outside
           |FROM st JOIN p2 USING (g)
           |GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY cohort""".stripMargin))

  /** X254: one-way ICC(1,1) of event values within users — how much
    * variance is between-user vs noise; the continuous sibling of
    * q202 kappa / q229 alpha. */
  private val q362 = Q("q362_icc",
    (s, dir) =>
      graft.de.Agreement.iccOneWay(t(s, dir, "events"), "user_id",
        "value"),
    Some("""WITH per AS (
           |  SELECT user_id, count(*) AS k, sum(value) AS sv,
           |    sum(value * value) AS sv2
           |  FROM events WHERE value IS NOT NULL GROUP BY 1),
           |agg AS (
           |  SELECT count(*)::BIGINT AS n_subjects,
           |    sum(k)::BIGINT AS n_ratings,
           |    sum(k * k) AS k2, sum(sv) AS tot, sum(sv2) AS tot2,
           |    sum(sv * sv / k) AS ssb_raw
           |  FROM per),
           |c AS (
           |  SELECT n_subjects, n_ratings,
           |    (n_ratings - k2 / n_ratings::DOUBLE) /
           |      nullif(n_subjects - 1, 0) AS k0,
           |    (ssb_raw - tot * tot / n_ratings::DOUBLE) /
           |      nullif(n_subjects - 1, 0) AS msb,
           |    (tot2 - ssb_raw) /
           |      nullif(n_ratings - n_subjects, 0) AS msw
           |  FROM agg)
           |SELECT n_subjects, n_ratings, round(k0, 4) AS k0,
           |  round(msb, 4) AS msb, round(msw, 4) AS msw,
           |  round((msb - msw) / nullif(msb + (k0 - 1) * msw, 0), 4)
           |    AS icc
           |FROM c""".stripMargin))

  /** X255: TOST equivalence of even- vs odd-user mean value per type
    * at margin δ = 5 — "provably the same within 5", which a
    * non-significant t-test cannot claim (two Simpson t-tail
    * integrals in the oracle). */
  private val q363 = Q("q363_tost",
    (s, dir) => {
      import s.implicits._
      graft.de.Inference.tostEquivalence(
        t(s, dir, "events").select($"event_type",
          when(pmod($"user_id", lit(2)) === 0, "A").otherwise("B")
            .as("grp"),
          $"value"),
        "event_type", "grp", "value", "A", "B", margin = 5.0)
        .orderBy($"event_type")
    },
    Some("""WITH st AS (
           |  SELECT event_type,
           |    count(CASE WHEN user_id % 2 = 0 THEN 1 END)::BIGINT
           |      AS n_a,
           |    avg(CASE WHEN user_id % 2 = 0 THEN value END) AS ma,
           |    var_samp(CASE WHEN user_id % 2 = 0 THEN value END)
           |      AS va,
           |    count(CASE WHEN user_id % 2 = 1 THEN 1 END)::BIGINT
           |      AS n_b,
           |    avg(CASE WHEN user_id % 2 = 1 THEN value END) AS mb,
           |    var_samp(CASE WHEN user_id % 2 = 1 THEN value END)
           |      AS vb
           |  FROM events WHERE value IS NOT NULL GROUP BY 1),
           |w AS (
           |  SELECT event_type, n_a, n_b, ma - mb AS diff,
           |    sqrt(va / n_a + vb / n_b) AS se,
           |    power(va / n_a + vb / n_b, 2) /
           |      nullif(power(va / n_a, 2) / (n_a - 1)
           |        + power(vb / n_b, 2) / (n_b - 1), 0) AS dfw
           |  FROM st),
           |ts AS (
           |  SELECT event_type, n_a, n_b, diff, se, dfw,
           |    (diff + 5.0) / nullif(se, 0) AS t1,
           |    (diff - 5.0) / nullif(se, 0) AS t2
           |  FROM w),
           |long AS (
           |  SELECT event_type, 1 AS tag, t1 AS t, dfw FROM ts
           |  UNION ALL
           |  SELECT event_type, 2, -t2, dfw FROM ts),
           |g2 AS (
           |  SELECT event_type, tag, t, dfw / 2.0 AS a,
           |    sqrt(1 - dfw / (dfw + t * t)) AS lo
           |  FROM long),
           |grid AS (SELECT g2.*, unnest(generate_series(0, 20000))
           |           AS j
           |         FROM g2),
           |pts AS (SELECT event_type, tag, a,
           |          lo + (1.0 - lo) * j / 20000 AS u,
           |          CASE WHEN j = 0 OR j = 20000 THEN 1
           |               WHEN j % 2 = 1 THEN 4 ELSE 2 END AS wt,
           |          (1.0 - lo) / 20000 AS h
           |        FROM grid),
           |simpson AS (
           |  SELECT event_type, tag, max(a) AS a,
           |    sum(wt * 2 * exp((a - 1.0) *
           |      ln(greatest(1e-300, 1 - u * u)))) * max(h) / 3.0
           |      AS binc
           |  FROM pts GROUP BY 1, 2),
           |ps AS (
           |  -- null-safe scope joins: a fuzzed NULL event_type group
           |  -- must survive to the output like the operator's groupBy
           |  -- keeps it (the q163 null-key-join class; fuzz-22)
           |  SELECT g2.event_type, g2.tag, g2.t,
           |    simpson.binc / exp(lgamma(simpson.a) + lgamma(0.5)
           |      - lgamma(simpson.a + 0.5)) / 2 AS half
           |  FROM g2 JOIN simpson
           |    ON g2.event_type IS NOT DISTINCT FROM simpson.event_type
           |   AND g2.tag = simpson.tag),
           |pv AS (
           |  SELECT event_type,
           |    max(CASE WHEN t >= 0 THEN half
           |        ELSE 1.0 - half END) AS p_tost
           |  FROM ps GROUP BY 1)
           |SELECT ts.event_type, n_a, n_b, round(diff, 4) AS diff,
           |  round(se, 4) AS se, round(dfw, 2) AS df,
           |  round(p_tost, 6) AS p_tost,
           |  p_tost < 0.05 AS equivalent
           |FROM ts JOIN pv
           |  ON ts.event_type IS NOT DISTINCT FROM pv.event_type
           |ORDER BY ts.event_type""".stripMargin))

  /** X256: DSIR-style importance scores — every non-English doc
    * scored by its mean unigram log-ratio against the English slice
    * (add-½ smoothing over the union vocab); exp-weights into q91's
    * sampler IS importance resampling. */
  private val q364 = Q("q364_dsir_scores",
    (s, dir) => {
      import s.implicits._
      graft.text.CorpusStats.importanceScores(
        t(s, dir, "documents"), "doc_id", "text", $"lang" === "en")
        .orderBy($"doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id AS d, lang = 'en' AS tgt,
           |    unnest(regexp_extract_all(text, '\S+')) AS t
           |  FROM documents),
           |vocab AS (
           |  SELECT t, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
           |    sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS cs
           |  FROM toks GROUP BY 1),
           |tot AS (SELECT sum(ct) AS tt, sum(cs) AS ts2,
           |          count(*) AS v
           |        FROM vocab),
           |sc AS (
           |  SELECT t, ln((ct + 0.5) / (tt + 0.5 * v))
           |    - ln((cs + 0.5) / (ts2 + 0.5 * v)) AS lr
           |  FROM vocab CROSS JOIN tot)
           |SELECT d AS doc_id, count(*)::BIGINT AS n_tokens,
           |  round(avg(lr), 6) AS avg_log_ratio
           |FROM toks JOIN sc USING (t) WHERE NOT tgt
           |GROUP BY 1 ORDER BY doc_id""".stripMargin))

  /** X258: Erlang-C staffing per event type over the q298 interval
    * convention — smallest server count with P(wait) ≤ 0.2; the
    * aᵏ/k! ladder rides two log-space cumulative windows (no
    * factorial overflow). */
  private val q365 = Q("q365_erlang_staffing",
    (s, dir) => {
      import s.implicits._
      val iv = t(s, dir, "events").select($"event_type",
        unix_micros($"ts").as("s"),
        (unix_micros($"ts") + round($"value").cast("long") * 1000000L)
          .as("e"))
      graft.report.Staffing.erlangStaffing(iv, "event_type", "s", "e",
        targetWait = 0.2, maxC = 60).orderBy($"event_type")
    },
    Some("""WITH iv AS (
           |  SELECT event_type, epoch_us(ts) AS s,
           |    epoch_us(ts) + round(value)::BIGINT * 1000000 AS e
           |  FROM events),
           |agg AS (
           |  SELECT event_type,
           |    count(*) / nullif((max(e) - min(s))::DOUBLE, 0) * 1e6
           |      AS lam,
           |    avg(e - s) / 1e6 AS sv
           |  FROM iv GROUP BY 1),
           |a2 AS (SELECT event_type, lam, sv, lam * sv AS a
           |       FROM agg WHERE lam * sv > 0),
           |grid AS (SELECT a2.*, unnest(generate_series(1, 60)) AS c
           |         FROM a2),
           |s2 AS (
           |  SELECT event_type, lam, sv, a, c,
           |    exp(c * ln(a) - lnf) AS term,
           |    1.0 + sum(exp(c * ln(a) - lnf)) OVER w - exp(c * ln(a)
           |      - lnf) AS csum
           |  FROM (SELECT grid.*, sum(ln(c)) OVER (PARTITION BY
           |          event_type ORDER BY c ROWS UNBOUNDED PRECEDING)
           |          AS lnf
           |        FROM grid)
           |  WINDOW w AS (PARTITION BY event_type ORDER BY c
           |    ROWS UNBOUNDED PRECEDING)),
           |pw AS (
           |  SELECT event_type, lam, sv, a, c,
           |    CASE WHEN a / c >= 1 THEN 1.0
           |         ELSE term / ((1 - a / c) * csum + term) END AS p
           |  FROM s2),
           |best AS (
           |  SELECT event_type, min(c) AS c_req
           |  FROM pw WHERE p <= 0.2 GROUP BY 1),
           |bp AS (SELECT pw.event_type, pw.p, best.c_req
           |       FROM pw JOIN best ON best.event_type = pw.event_type
           |         AND best.c_req = pw.c),
           |mx AS (SELECT event_type, p AS pmax FROM pw WHERE c = 60)
           |SELECT a2.event_type, round(lam * 3600, 4)
           |    AS arrivals_per_hour,
           |  round(sv, 4) AS avg_service_sec,
           |  round(a, 4) AS offered_erlangs,
           |  c_req::INT AS c_req,
           |  round(coalesce(bp.p, mx.pmax), 4) AS p_wait
           |FROM a2 LEFT JOIN bp USING (event_type)
           |JOIN mx USING (event_type)
           |ORDER BY a2.event_type""".stripMargin))

  /** X259: Syntetos–Boylan demand classification of parts by monthly
    * order quantity (smooth/intermittent/erratic/lumpy — which
    * forecaster per item). */
  private val q366 = Q("q366_demand_classes",
    (s, dir) => {
      import s.implicits._
      val monthly = t(s, dir, "lineitem")
        .filter($"l_shipdate".isNotNull) // null-instant (fuzz-37)
        .groupBy($"l_partkey", date_trunc("month", $"l_shipdate")
          .as("m"))
        .agg(sum($"l_quantity").cast("double").as("qty"))
      graft.report.Inventory.demandClasses(monthly, "l_partkey",
        "m", "qty").orderBy($"demand_class")
    },
    Some("""WITH monthly AS (
           |  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
           |    sum(l_quantity)::DOUBLE AS qty
           |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1, 2),
           |nb AS (SELECT count(DISTINCT m)::DOUBLE AS nb
           |       FROM monthly WHERE qty > 0),
           |per AS (
           |  SELECT l_partkey, count(DISTINCT m) AS nz,
           |    avg(qty) AS mu, var_pop(qty) AS v
           |  FROM monthly WHERE qty > 0 GROUP BY 1),
           |cl AS (
           |  SELECT nb / nz AS adi,
           |    coalesce(v / nullif(mu * mu, 0), 0) AS cv2
           |  FROM per CROSS JOIN nb),
           |lab AS (
           |  SELECT CASE
           |      WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
           |      WHEN adi >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
           |      WHEN adi < 1.32 THEN 'erratic'
           |      ELSE 'lumpy' END AS demand_class, adi, cv2
           |  FROM cl)
           |SELECT demand_class, count(*)::BIGINT AS n_items,
           |  round(avg(adi), 4) AS avg_adi,
           |  round(avg(cv2), 4) AS avg_cv2
           |FROM lab GROUP BY 1 ORDER BY demand_class""".stripMargin))

  /** X260: D'Agostino K² omnibus normality (closed-form Z_s/Z_k,
    * exact χ²₂ p) — scipy.normaltest parity, finite-n-calibrated
    * upgrade of q322. */
  private val q367 = Q("q367_dagostino",
    (s, dir) => {
      import s.implicits._
      graft.de.Moments.dagostinoK2(t(s, dir, "events"),
        "event_type", "value").orderBy($"event_type")
    },
    Some("""WITH a AS (
           |  SELECT event_type, count(*)::DOUBLE AS n,
           |    sum(value) AS s1, sum(value * value) AS s2,
           |    sum(value * value * value) AS s3,
           |    sum(value * value * value * value) AS s4
           |  FROM events WHERE value IS NOT NULL GROUP BY 1
           |  HAVING count(*) >= 20),
           |mm AS (
           |  SELECT event_type, n, s1 / n AS mu,
           |    s2 / n - (s1 / n) * (s1 / n) AS m2,
           |    s3 / n - 3 * (s1 / n) * s2 / n
           |      + 2 * pow(s1 / n, 3) AS m3,
           |    s4 / n - 4 * (s1 / n) * s3 / n
           |      + 6 * pow(s1 / n, 2) * s2 / n
           |      - 3 * pow(s1 / n, 4) AS m4
           |  FROM a),
           |bb AS (
           |  SELECT event_type, n,
           |    m3 / (sqrt(m2) * m2) AS b1, m4 / (m2 * m2) AS b2
           |  FROM mm),
           |zs AS (
           |  SELECT event_type, n, b1, b2,
           |    b1 * sqrt((n + 1) * (n + 3) / (6 * (n - 2))) AS y,
           |    3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3) /
           |      ((n - 2) * (n + 5) * (n + 7) * (n + 9)) AS beta2
           |  FROM bb),
           |z1 AS (
           |  SELECT event_type, n, b2,
           |    (1 / sqrt(ln(sqrt(sqrt(2 * (beta2 - 1)) - 1)))) *
           |    ln(y / sqrt(2 / (sqrt(2 * (beta2 - 1)) - 2)) +
           |       sqrt(pow(y / sqrt(2 / (sqrt(2 * (beta2 - 1)) - 2)),
           |         2) + 1)) AS zskew
           |  FROM zs),
           |z2 AS (
           |  SELECT event_type, n, zskew,
           |    (b2 - 3.0 * (n - 1) / (n + 1)) /
           |      sqrt(24.0 * n * (n - 2) * (n - 3) /
           |        ((n + 1) * (n + 1) * (n + 3) * (n + 5))) AS x,
           |    6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9)) *
           |      sqrt(6.0 * (n + 3) * (n + 5) /
           |        (n * (n - 2) * (n - 3))) AS sb1
           |  FROM z1),
           |z3 AS (
           |  SELECT event_type, n, zskew, x,
           |    6.0 + 8.0 / sb1 * (2.0 / sb1 +
           |      sqrt(1 + 4.0 / (sb1 * sb1))) AS aa
           |  FROM z2),
           |z4 AS (
           |  SELECT event_type, n, zskew,
           |    (1 - 2.0 / (9 * aa) -
           |     cbrt((1 - 2.0 / aa) / (1 + x * sqrt(2.0 / (aa - 4)))))
           |      * sqrt(9.0 * aa / 2) AS zkurt
           |  FROM z3)
           |SELECT event_type, n::BIGINT AS n,
           |  round(zskew, 4) AS z_skew, round(zkurt, 4) AS z_kurt,
           |  round(zskew * zskew + zkurt * zkurt, 4) AS k2,
           |  round(exp(-(zskew * zskew + zkurt * zkurt) / 2), 6)
           |    AS p_value
           |FROM z4 ORDER BY event_type""".stripMargin))

  /** X261: MDE at current traffic per type — "what lift could this
    * segment even detect" before launching a test. */
  private val q368 = Q("q368_power_mde",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.mdeAtCurrentTraffic(
        t(s, dir, "events").select($"event_type",
          when($"value" > 100, 1).otherwise(0).as("x")),
        "event_type", "x").orderBy($"event_type")
    },
    Some("""WITH a AS (
           |  SELECT event_type, count(*)::BIGINT AS n,
           |    avg(CASE WHEN value > 100 THEN 1.0 ELSE 0.0 END) AS p
           |  FROM events GROUP BY 1),
           |m AS (
           |  SELECT event_type, n, p, n // 2 AS n_arm,
           |    CASE WHEN p > 0 AND p < 1 THEN
           |      (1.959964 + 0.841621) *
           |        sqrt(2 * p * (1 - p) / (n // 2)) END AS mde
           |  FROM a)
           |SELECT event_type, n, round(p, 6) AS base_rate,
           |  n_arm AS n_per_arm, round(mde, 6) AS mde_abs,
           |  round(mde / p, 4) AS mde_rel
           |FROM m ORDER BY event_type""".stripMargin))

  /** X262: historical bandit regret of the logged traffic allocation
    * against the best single arm (event types as arms, value as
    * reward). */
  private val q369 = Q("q369_bandit_regret",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.banditRegret(t(s, dir, "events"),
        "event_type", "value").orderBy($"event_type")
    },
    Some("""WITH arms AS (
           |  SELECT event_type, count(*)::BIGINT AS n_pulls,
           |    avg(value) AS m
           |  FROM events WHERE value IS NOT NULL GROUP BY 1),
           |r AS (
           |  SELECT event_type, n_pulls, m,
           |    n_pulls * (max(m) OVER () - m) AS regret
           |  FROM arms)
           |SELECT event_type, n_pulls, round(m, 4) AS mean_reward,
           |  round(regret, 4) AS regret,
           |  round(regret / nullif(sum(regret) OVER (), 0), 4)
           |    AS regret_share,
           |  round(sum(regret) OVER (), 4) AS total_regret
           |FROM r ORDER BY event_type""".stripMargin))

  val all: Seq[Q] = Seq(q322, q323, q324, q325, q326, q327, q328,
    q329, q330, q331, q332, q333, q334, q335, q336, q337, q338,
    q339, q340, q341, q342, q343, q344, q345, q346, q347, q348,
    q349, q350, q351, q352, q353, q354, q355, q356, q357, q358,
    q359, q360, q361, q362, q363, q364, q365, q366, q367, q368,
    q369)
}
