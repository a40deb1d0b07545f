package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-8 batch: sequential patterns
  * and drift/trend screens — pair support (X176), transition entropy
  * rate (X177), Storey π₀ (X178), burst ratio (X179), Page–Hinkley
  * (X180), Cochran–Armitage (X181).
  */
object CatalogSeq {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X176: ordered-pair sequential support over the per-(user, type)
    * first/last timestamps — "A then B" counting without touching the
    * event grain twice. */
  private val q285 = Q("q285_seq_pairs",
    (s, dir) =>
      graft.events.SeqPatterns.pairSupport(t(s, dir, "events"),
        "user_id", "event_type", "ts"),
    Some("""WITH spans AS (
           |  SELECT user_id, event_type, min(ts) AS f, max(ts) AS l
           |  FROM events GROUP BY 1, 2)
           |SELECT a.event_type AS type_a, b.event_type AS type_b,
           |  count(CASE WHEN a.f < b.l THEN 1 END)::BIGINT AS n_users_seq,
           |  count(*)::BIGINT AS n_users_both,
           |  round(count(CASE WHEN a.f < b.l THEN 1 END) /
           |        count(*)::DOUBLE, 4) AS support
           |FROM spans a JOIN spans b ON a.user_id = b.user_id
           |  AND a.event_type <> b.event_type
           |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin))

  /** X177: per-state next-action entropy + transition-share-weighted
    * entropy rate (one lead window at event grain, then state-bounded). */
  private val q286 = Q("q286_entropy_rate",
    (s, dir) =>
      graft.events.SeqPatterns.transitionEntropy(
        t(s, dir, "events").filter(col("ts").isNotNull),
        "user_id", "event_type", "ts", "event_id"),
    Some("""WITH tr AS (
           |  SELECT event_type AS state,
           |    lead(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS nxt
           |  FROM events WHERE ts IS NOT NULL),
           |c AS (SELECT state, nxt, count(*) AS c FROM tr
           |      WHERE nxt IS NOT NULL GROUP BY 1, 2),
           |st AS (SELECT state, sum(c) AS n_trans,
           |         ln(sum(c)) - sum(c * ln(c)) / sum(c) AS h
           |       FROM c GROUP BY 1)
           |SELECT state, n_trans::BIGINT AS n_trans,
           |  round(h, 4) AS entropy,
           |  round(n_trans::DOUBLE / sum(n_trans) OVER (), 4) AS share,
           |  round(sum(h * n_trans) OVER () / sum(n_trans) OVER (), 4)
           |    AS entropy_rate
           |FROM st ORDER BY state""".stripMargin))

  /** X178: Storey π₀ over a λ grid, the q-value ingredient; p-values
    * stand in as value/100 (uniform-ish on the synthetic events). One
    * conditional-aggregate scan for every λ. */
  private val q287 = Q("q287_storey_pi0",
    (s, dir) => {
      import s.implicits._
      graft.de.Stats.storeyPi0(
        t(s, dir, "events").select(($"value" / 100.0).as("p")), "p")
    },
    Some("""WITH l AS (SELECT unnest([0.2, 0.35, 0.5, 0.65, 0.8]::DOUBLE[])
           |             AS lambda),
           |p AS (SELECT value / 100.0 AS pv FROM events
           |      WHERE value IS NOT NULL)
           |SELECT round(lambda, 2)::DOUBLE AS lambda, count(*)::BIGINT AS m,
           |  count(CASE WHEN pv > lambda THEN 1 END)::BIGINT AS n_above,
           |  round(least(1.0, count(CASE WHEN pv > lambda THEN 1 END) /
           |    ((1 - lambda) * count(*))), 4) AS pi0
           |FROM p CROSS JOIN l GROUP BY lambda ORDER BY lambda""".stripMargin))

  /** X179: hourly burst ratio per event type — max hourly rate over
    * the mean hourly rate, the load-spike screen; two exact-integer
    * aggregates. */
  private val q288 = Q("q288_burst_ratio",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
        .agg(count(lit(1)).as("n"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_hours"),
          max($"n").as("max_hourly"),
          round(avg($"n"), 4).as("avg_hourly"),
          round(max($"n") / avg($"n"), 4).as("burst_ratio"))
        .orderBy($"event_type")
    },
    Some("""WITH h AS (
           |  SELECT event_type, date_trunc('hour', ts) AS h,
           |    count(*) AS n
           |  FROM events GROUP BY 1, 2)
           |SELECT event_type, count(*)::BIGINT AS n_hours,
           |  max(n)::BIGINT AS max_hourly,
           |  round(avg(n), 4) AS avg_hourly,
           |  round(max(n) / avg(n), 4) AS burst_ratio
           |FROM h GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** X180: Page–Hinkley drift statistic over per-type daily counts —
    * pure ordered windows (running mean / prefix sum / running min),
    * so both engines evaluate the identical sequential float chain. */
  private val q289 = Q("q289_page_hinkley",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).as("x"))
      graft.events.Changepoint.pageHinkley(daily, "event_type", "d",
          "x", delta = 0.0, lambda = 10.0)
        .orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS k, ts::DATE AS d, count(*) AS x
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |w AS (SELECT k, d, x,
           |  x - avg(x) OVER (PARTITION BY k ORDER BY d
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 0.0
           |    AS dev FROM d),
           |ph AS (SELECT k, d, sum(dev) OVER (PARTITION BY k ORDER BY d
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
           |  FROM w),
           |g AS (SELECT k, d, round(ph - min(ph) OVER (PARTITION BY k
           |    ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
           |    ROW), 6) AS gap FROM ph),
           |r AS (SELECT k, d, gap,
           |  row_number() OVER (PARTITION BY k ORDER BY gap DESC, d)
           |    AS rn,
           |  count(*) OVER (PARTITION BY k) AS n FROM g)
           |SELECT k AS event_type, n::BIGINT AS n,
           |  round(gap, 4) AS ph_stat, d AS detect_at,
           |  gap > 10.0 AS alarm
           |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin))

  /** X181: Cochran–Armitage dose-response trend — ordinal dose from
    * the priority code's leading digit, success = finished order;
    * exact-integer sufficient statistics, single-row readout. */
  private val q290 = Q("q290_cochran_armitage",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.cochranArmitage(
        t(s, dir, "orders").select(
          // digit-guarded: a fuzz-injected non-numeric priority must
          // yield a null dose (dropped by the operator's
          // complete-case), not an ANSI cast error
          when(substring($"o_orderpriority", 1, 1).rlike("^[0-9]$"),
            substring($"o_orderpriority", 1, 1).cast("int"))
            .as("dose"),
          ($"o_orderstatus" === "F").cast("long").as("succ")),
        "dose", "succ")
    },
    Some("""WITH pd AS (
           |  SELECT try_cast(substring(o_orderpriority, 1, 1) AS INT)
           |      ::DOUBLE AS w,
           |    count(*) AS n,
           |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS r
           |  FROM orders
           |  WHERE try_cast(substring(o_orderpriority, 1, 1) AS INT)
           |          IS NOT NULL
           |    AND o_orderstatus IS NOT NULL
           |  GROUP BY 1),
           |a AS (SELECT sum(n) AS nn, sum(r) AS rr,
           |        count(*) AS nd, sum(w * r) AS wr, sum(w * n) AS wn,
           |        sum(w * w * n) AS wwn FROM pd)
           |SELECT nn::BIGINT AS n, nd::BIGINT AS n_doses,
           |  round(wr - (rr::DOUBLE / nn) * wn, 4) AS t_stat,
           |  round((wr - (rr::DOUBLE / nn) * wn) /
           |    sqrt((rr::DOUBLE / nn) * (1 - rr::DOUBLE / nn) *
           |      (wwn - wn * wn / nn)), 4) AS z,
           |  round(pow((wr - (rr::DOUBLE / nn) * wn) /
           |    sqrt((rr::DOUBLE / nn) * (1 - rr::DOUBLE / nn) *
           |      (wwn - wn * wn / nn)), 2), 4) AS chi2
           |FROM a""".stripMargin))

  /** X182: Sharpe/Sortino over the per-type daily value series (2dp
    * bucket sums so the return chain starts from identical doubles). */
  private val q291 = Q("q291_sharpe_sortino",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(round(sum($"value"), 2).as("v"))
      graft.events.Finance.sharpeSortino(daily, "event_type", "d", "v")
        .orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type, ts::DATE AS d, round(sum(value), 2) AS v
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |r AS (SELECT event_type,
           |        v / nullif(lag(v) OVER (PARTITION BY event_type
           |          ORDER BY d), 0) - 1.0 AS r
           |      FROM d)
           |SELECT event_type, count(*)::BIGINT AS n_returns,
           |  round(avg(r), 6) AS mean_ret,
           |  round(avg(r) / nullif(stddev_samp(r), 0), 4) AS sharpe,
           |  round(avg(r) / nullif(stddev_samp(least(r, 0.0)), 0), 4)
           |    AS sortino
           |FROM r WHERE r IS NOT NULL
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** X183: ABC×XYZ planning matrix over part demand — value classes
    * crossed with demand-variability classes (cv of monthly demand). */
  private val q292 = Q("q292_abc_xyz",
    (s, dir) => {
      import s.implicits._
      graft.report.Abc.abcXyz(
        t(s, dir, "lineitem").select(
          ($"l_partkey" % 199).as("pk"),
          date_trunc("month", $"l_shipdate").as("mo"),
          $"l_quantity".cast("long").as("q"),
          round($"l_extendedprice" * 100).cast("long").as("cents")),
        "pk", "mo", "q", "cents")
        .orderBy($"pk")
    },
    Some("""WITH pb AS (
           |  SELECT l_partkey % 199 AS pk,
           |    date_trunc('month', l_shipdate) AS mo,
           |    sum(l_quantity::BIGINT) AS q,
           |    sum(round(l_extendedprice * 100)::BIGINT) AS v
           |  FROM lineitem GROUP BY 1, 2),
           |pk AS (SELECT pk, sum(v) AS total_cents,
           |         count(*) AS n_buckets, avg(q) AS mq,
           |         stddev_samp(q::DOUBLE) AS sq
           |       FROM pb GROUP BY 1),
           |abc AS (SELECT pk, total_cents,
           |  CASE WHEN sum(total_cents) OVER (ORDER BY total_cents DESC,
           |         pk ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
           |         ROW) * 100 <= sum(total_cents) OVER () * 80 THEN 'A'
           |       WHEN sum(total_cents) OVER (ORDER BY total_cents DESC,
           |         pk ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
           |         ROW) * 100 <= sum(total_cents) OVER () * 95 THEN 'B'
           |       ELSE 'C' END AS abc_class
           |  FROM pk)
           |SELECT k.pk, k.total_cents::BIGINT AS total_cents,
           |  a.abc_class, k.n_buckets::BIGINT AS n_buckets,
           |  round(k.mq, 4) AS mean_demand,
           |  round(k.sq / nullif(k.mq, 0), 4) AS cv,
           |  CASE WHEN k.sq IS NULL THEN 'Z'
           |       WHEN k.sq / nullif(k.mq, 0) < 0.5 THEN 'X'
           |       WHEN k.sq / nullif(k.mq, 0) < 1.0 THEN 'Y'
           |       ELSE 'Z' END AS xyz_class,
           |  a.abc_class || '-' ||
           |  CASE WHEN k.sq IS NULL THEN 'Z'
           |       WHEN k.sq / nullif(k.mq, 0) < 0.5 THEN 'X'
           |       WHEN k.sq / nullif(k.mq, 0) < 1.0 THEN 'Y'
           |       ELSE 'Z' END AS class
           |FROM pk k JOIN abc a USING (pk) ORDER BY k.pk""".stripMargin))

  /** X184: inter-arrival exponential fit + KS distance per event type
    * — "is this stream Poisson-like". Gaps are exact-microsecond
    * ratios, D from exact ranks. */
  private val q293 = Q("q293_interarrival_expfit",
    (s, dir) => {
      import s.implicits._
      graft.events.Intervals.interArrivalExpFit(
        t(s, dir, "events"), "event_type", "ts", "event_id")
        .orderBy($"event_type")
    },
    Some("""WITH g AS (
           |  SELECT event_type,
           |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (
           |      PARTITION BY event_type ORDER BY ts, event_id))
           |      / 1000000 AS g
           |  FROM events),
           |v AS (SELECT event_type, g FROM g WHERE g IS NOT NULL),
           |r AS (SELECT event_type, g,
           |        row_number() OVER (PARTITION BY event_type
           |          ORDER BY g ASC) AS i,
           |        count(*) OVER (PARTITION BY event_type) AS n,
           |        sum(g) OVER (PARTITION BY event_type)::DOUBLE /
           |          count(*) OVER (PARTITION BY event_type) AS m
           |      FROM v),
           |d AS (SELECT event_type, i, n, m,
           |        greatest(
           |          abs(i / n::DOUBLE - (1 - exp(-g / m))),
           |          abs((i - 1) / n::DOUBLE - (1 - exp(-g / m)))) AS dd
           |      FROM r WHERE n >= 3 AND m > 0)
           |SELECT event_type, max(n)::BIGINT AS n_gaps,
           |  round(max(m), 4) AS mean_gap_sec,
           |  round(3600.0 / max(m), 4) AS rate_per_hour,
           |  round(max(dd), 4) AS ks_d
           |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** X185: vocabulary coverage curve — token-stream share covered by
    * the top-N terms, for the tokenizer-sizing grid. */
  private val q294 = Q("q294_vocab_coverage",
    (s, dir) =>
      graft.text.CorpusStats.vocabCoverage(t(s, dir, "documents"),
        "text"),
    Some("""WITH c AS (
           |  SELECT t AS term, count(*) AS c
           |  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS t
           |        FROM documents) GROUP BY 1),
           |r AS (SELECT term, c,
           |        row_number() OVER (ORDER BY c DESC, term ASC) AS r,
           |        sum(c) OVER (ORDER BY c DESC, term ASC
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |          AS cum,
           |        sum(c) OVER () AS tot
           |      FROM c),
           |n AS (SELECT unnest([10, 50, 100, 500, 1000]) AS top_n)
           |SELECT top_n::INT AS top_n, count(*)::BIGINT AS n_terms_used,
           |  max(cum)::BIGINT AS covered_tokens,
           |  round(max(cum)::DOUBLE / max(tot), 4) AS coverage
           |FROM r JOIN n ON r.r <= n.top_n
           |GROUP BY top_n ORDER BY top_n""".stripMargin))

  /** X186: per-document novel-bigram rate (distinct bigrams with
    * corpus df = 1 — unique content vs boilerplate). */
  private val q295 = Q("q295_novel_bigrams",
    (s, dir) => {
      import s.implicits._
      graft.text.CorpusStats.novelBigramRate(t(s, dir, "documents"),
        "doc_id", "text")
        .orderBy($"doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk
           |  FROM documents),
           |g AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] AS bg
           |      FROM (SELECT doc_id, tk,
           |              unnest(generate_series(1, len(tk) - 1)) AS i
           |            FROM toks)),
           |df AS (SELECT bg, count(*) AS df FROM g GROUP BY 1)
           |SELECT g.doc_id, count(*)::BIGINT AS n_bigrams,
           |  count(CASE WHEN df.df = 1 THEN 1 END)::BIGINT AS n_novel,
           |  round(count(CASE WHEN df.df = 1 THEN 1 END) /
           |    count(*)::DOUBLE, 4) AS novelty
           |FROM g JOIN df USING (bg)
           |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin))

  /** X187: strongly connected components (directed) — Tarjan driver
    * with a distributed Orzan-coloring twin (SccSpec pins their
    * parity); the oracle is algorithm-independent MUTUAL REACHABILITY
    * via a recursive CTE (component = min mutually-reachable node),
    * so the compare proves the SCC semantics, not the algorithm. The
    * graph: a deterministic 40-vertex projection of events with
    * forward edges plus a sampled back-edge set (so the condensation
    * has real multi-node SCCs AND singletons). */
  private val q296 = Q("q296_scc",
    (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .withColumn("src", $"user_id" % 40)
        .withColumn("dst", pmod($"event_id" * 31, lit(40)))
        .filter($"event_id" % 13 === 0 && $"src" =!= $"dst" &&
          ($"src" < $"dst" || $"event_id" % 5 === 0))
        .select($"src", $"dst").distinct()
      val nodes = e.select($"src".as("node"))
        .union(e.select($"dst".as("node"))).distinct()
      graft.graph.Scc.components(s, nodes, e)
    },
    Some("""WITH RECURSIVE e AS (
           |  SELECT DISTINCT user_id % 40 AS src,
           |    (event_id * 31) % 40 AS dst
           |  FROM events
           |  WHERE event_id % 13 = 0
           |    AND user_id % 40 <> (event_id * 31) % 40
           |    AND (user_id % 40 < (event_id * 31) % 40
           |         OR event_id % 5 = 0)),
           |n AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
           |reach AS (
           |  SELECT v AS s, v AS t FROM n
           |  UNION
           |  SELECT r.s, e.dst FROM reach r JOIN e ON r.t = e.src)
           |SELECT a.s::BIGINT AS node, min(a.t)::BIGINT AS component
           |FROM reach a JOIN reach b ON a.t = b.s AND b.t = a.s
           |GROUP BY 1 ORDER BY node""".stripMargin))

  /** X188: isotonic regression (PAVA) per key over 10 value buckets —
    * oracled against the algorithm-independent minimax closed form
    * y*_k = min_{j≥k} max_{i≤k} wavg(y[i..j]) from integer prefix
    * sums, so the compare proves the FIT, not the pooling algorithm.
    * Label = deterministic event_id % 3 indicator. */
  private val q297 = Q("q297_isotonic",
    (s, dir) => {
      import s.implicits._
      graft.ml.Isotonic.calibrate(
        t(s, dir, "events")
          .select($"event_type", floor($"value" / 10).cast("double")
            .as("bk"), ($"event_id" % 3 === 0).cast("long").as("y")),
        "event_type", "bk", "y")
        .withColumnRenamed("key", "event_type")
        .orderBy($"event_type", $"bucket")
    },
    Some("""WITH f AS (
           |  SELECT event_type AS k, floor(value / 10) AS b,
           |    CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS y
           |  FROM events WHERE value IS NOT NULL),
           |bk AS (SELECT k, b, count(*) AS w, sum(y) AS sy
           |       FROM f GROUP BY 1, 2),
           |r AS (SELECT k, b, w, sy,
           |        row_number() OVER (PARTITION BY k ORDER BY b) AS r,
           |        sum(w) OVER (PARTITION BY k ORDER BY b) AS cw,
           |        sum(sy) OVER (PARTITION BY k ORDER BY b) AS cs
           |      FROM bk),
           |base AS (SELECT k, r AS r0, cw AS cw0, cs AS cs0 FROM r
           |         UNION ALL
           |         SELECT DISTINCT k, 0, 0, 0 FROM r),
           |mx AS (SELECT kk.k, kk.r AS rk, j.r AS rj,
           |         max((j.cs - i0.cs0)::DOUBLE /
           |             (j.cw - i0.cw0)) AS mx
           |       FROM r kk
           |       JOIN r j ON j.k IS NOT DISTINCT FROM kk.k
           |                AND j.r >= kk.r
           |       JOIN base i0 ON i0.k IS NOT DISTINCT FROM kk.k
           |                   AND i0.r0 <= kk.r - 1
           |       GROUP BY 1, 2, 3),
           |iso AS (SELECT k, rk, min(mx) AS v FROM mx GROUP BY 1, 2)
           |SELECT r.k AS event_type, r.b::DOUBLE AS bucket,
           |  r.w::BIGINT AS n,
           |  round(r.sy::DOUBLE / r.w, 6) AS rate_raw,
           |  round(iso.v, 6) AS rate_iso
           |FROM r JOIN iso ON iso.k IS NOT DISTINCT FROM r.k
           |           AND iso.rk = r.r
           |ORDER BY event_type, bucket""".stripMargin))

  /** X189: peak concurrency (sweep line, end-exclusive) — intervals
    * are (ts, ts + round(value) seconds) in exact epoch micros. */
  private val q298 = Q("q298_max_concurrency",
    (s, dir) => {
      import s.implicits._
      val iv = t(s, dir, "events").select($"event_type",
        unix_micros($"ts").as("s"),
        (unix_micros($"ts") + round($"value").cast("long") * 1000000L)
          .as("e"))
      graft.events.Intervals.maxConcurrency(iv, "event_type", "s", "e")
        .orderBy($"event_type")
    },
    Some("""WITH iv AS (
           |  -- operator contract: a half-specified interval (fuzzed
           |  -- null value => null end) is no interval (fuzz-21)
           |  SELECT event_type, epoch_us(ts) AS s,
           |    epoch_us(ts) + round(value)::BIGINT * 1000000 AS e
           |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
           |sw AS (
           |  SELECT event_type, s AS t, 1 AS d FROM iv
           |  UNION ALL
           |  SELECT event_type, e AS t, -1 AS d FROM iv),
           |run AS (SELECT event_type, t, d,
           |    sum(d) OVER (PARTITION BY event_type ORDER BY t, d
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS run
           |  FROM sw),
           |best AS (SELECT event_type, t, run,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY run DESC, t ASC) AS rn,
           |    count(CASE WHEN d = 1 THEN 1 END)
           |      OVER (PARTITION BY event_type) AS n
           |  FROM run)
           |SELECT event_type, n::BIGINT AS n_intervals,
           |  run::BIGINT AS peak, t AS peak_at
           |FROM best WHERE rn = 1 ORDER BY event_type""".stripMargin))

  /** X190: Allen's 13 interval relations over the first 8 intervals
    * per type (rank-bounded pair set; the taxonomy CASE is the whole
    * operator, so the oracle is the same CASE independently written). */
  private val q299 = Q("q299_allen_relations",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"event_type")
        .orderBy($"ts", $"event_id")
      val iv = t(s, dir, "events")
        // null-instant complete-case BEFORE the rank-8 pick (fuzz-37:
        // Spark ranks nulls first, so every pick was a null interval)
        .filter($"ts".isNotNull)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 8)
        .select($"event_type", $"event_id".as("id"),
          unix_micros($"ts").as("s"),
          (unix_micros($"ts") + round($"value").cast("long") * 1000000L)
            .as("e"))
      graft.events.Intervals.allenRelations(iv, "event_type", "id",
          "s", "e")
        .orderBy($"event_type", $"id_a", $"id_b")
    },
    Some("""WITH iv0 AS (
           |  SELECT event_type, event_id AS id, epoch_us(ts) AS s,
           |    epoch_us(ts) + round(value)::BIGINT * 1000000 AS e,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY ts, event_id) AS rn
           |  FROM events WHERE ts IS NOT NULL QUALIFY rn <= 8),
           |-- operator contract: null end = no interval, dropped AFTER
           |-- the rank-8 selection (fuzz-21)
           |iv AS (SELECT * FROM iv0 WHERE e IS NOT NULL)
           |SELECT a.event_type, a.id AS id_a, b.id AS id_b,
           |  CASE WHEN a.e < b.s THEN 'before'
           |       WHEN b.e < a.s THEN 'before_inv'
           |       WHEN a.e = b.s THEN 'meets'
           |       WHEN b.e = a.s THEN 'meets_inv'
           |       WHEN a.s = b.s AND a.e = b.e THEN 'equals'
           |       WHEN a.s = b.s AND a.e < b.e THEN 'starts'
           |       WHEN a.s = b.s AND a.e > b.e THEN 'starts_inv'
           |       WHEN a.e = b.e AND a.s > b.s THEN 'finishes'
           |       WHEN a.e = b.e AND a.s < b.s THEN 'finishes_inv'
           |       WHEN a.s > b.s AND a.e < b.e THEN 'during'
           |       WHEN a.s < b.s AND a.e > b.e THEN 'during_inv'
           |       WHEN a.s < b.s AND a.e < b.e THEN 'overlaps'
           |       ELSE 'overlaps_inv' END AS relation
           |FROM iv a JOIN iv b
           |  ON a.event_type = b.event_type AND a.id < b.id
           |ORDER BY a.event_type, id_a, id_b""".stripMargin))

  /** X191: Unicode script profile / mixed-script audit — Cyrillic
    * injected deterministically on doc_id % 9 (the q48 pattern) so
    * the mixed flag has real positives; the regex engines differ in
    * script-class SYNTAX (Java \p{IsCyrillic} vs RE2 \p{Cyrillic})
    * but agree on membership, which is what the counts read. */
  private val q300 = Q("q300_script_profile",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id",
        when($"doc_id" % 9 === 0, concat($"text", lit(" съешь ещё")))
          .otherwise($"text").as("text"))
      graft.text.TextAnalysis.scriptProfile(docs, "doc_id", "text")
        .orderBy($"doc_id")
    },
    Some("""WITH d AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 9 = 0 THEN text || ' съешь ещё'
           |         ELSE text END AS text
           |  FROM documents)
           |SELECT doc_id,
           |  len(regexp_extract_all(text, '\p{Latin}'))::INT AS n_latin,
           |  len(regexp_extract_all(text, '\p{Cyrillic}'))::INT
           |    AS n_cyrillic,
           |  len(regexp_extract_all(text, '\p{Greek}'))::INT AS n_greek,
           |  len(regexp_extract_all(text, '[0-9]'))::INT AS n_digit,
           |  (CASE WHEN len(regexp_extract_all(text, '\p{Latin}')) > 0
           |        THEN 1 ELSE 0 END +
           |   CASE WHEN len(regexp_extract_all(text, '\p{Cyrillic}')) > 0
           |        THEN 1 ELSE 0 END +
           |   CASE WHEN len(regexp_extract_all(text, '\p{Greek}')) > 0
           |        THEN 1 ELSE 0 END) >= 2 AS mixed
           |FROM d ORDER BY doc_id""".stripMargin))

  /** X192: Fisher's exact test per event type on two deterministic
    * 0/1 indicators — both engines build ln-factorials from the SAME
    * sequential cumulative Σln table, so the hypergeometric pmfs are
    * bit-identical (no lgamma approximations in the compare). */
  private val q301 = Q("q301_fisher_exact",
    (s, dir) => {
      import s.implicits._
      graft.de.Inference.fisherExact(
        t(s, dir, "events").select($"event_type",
          pmod($"event_id", lit(2)).cast("int").as("x"),
          when($"event_id" % 3 === 0, 1).otherwise(0).as("y")),
        "event_type", "x", "y")
        .orderBy($"event_type")
    },
    Some("""WITH cnt AS (
           |  SELECT event_type AS s,
           |    count(CASE WHEN event_id % 2 = 1 AND event_id % 3 = 0
           |               THEN 1 END) AS a,
           |    count(CASE WHEN event_id % 2 = 1 AND event_id % 3 <> 0
           |               THEN 1 END) AS b,
           |    count(CASE WHEN event_id % 2 = 0 AND event_id % 3 = 0
           |               THEN 1 END) AS c,
           |    count(CASE WHEN event_id % 2 = 0 AND event_id % 3 <> 0
           |               THEN 1 END) AS d
           |  FROM events GROUP BY 1),
           |m AS (SELECT *, a + b AS m1, c + d AS m2, a + c AS n1,
           |        a + b + c + d AS nn FROM cnt),
           |lf AS (SELECT i AS id,
           |    sum(CASE WHEN i > 0 THEN ln(i::DOUBLE) ELSE 0 END)
           |      OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND
           |            CURRENT ROW) AS lf
           |  FROM (SELECT unnest(generate_series(0, mx)) AS i
           |        FROM (SELECT max(nn) AS mx FROM m))),
           |obs AS (SELECT m.*,
           |    (SELECT lf FROM lf WHERE id = m.m1)
           |    - (SELECT lf FROM lf WHERE id = m.a)
           |    - (SELECT lf FROM lf WHERE id = m.m1 - m.a)
           |    + (SELECT lf FROM lf WHERE id = m.m2)
           |    - (SELECT lf FROM lf WHERE id = m.n1 - m.a)
           |    - (SELECT lf FROM lf WHERE id = m.m2 - m.n1 + m.a)
           |    - (SELECT lf FROM lf WHERE id = m.nn)
           |    + (SELECT lf FROM lf WHERE id = m.n1)
           |    + (SELECT lf FROM lf WHERE id = m.nn - m.n1) AS lnpobs
           |  FROM m),
           |grid AS (SELECT o.*,
           |    unnest(generate_series(greatest(0, o.n1 - o.m2),
           |      least(o.m1, o.n1))) AS k
           |  FROM obs o),
           |terms AS (SELECT g.*,
           |    (SELECT lf FROM lf WHERE id = g.m1)
           |    - (SELECT lf FROM lf WHERE id = g.k)
           |    - (SELECT lf FROM lf WHERE id = g.m1 - g.k)
           |    + (SELECT lf FROM lf WHERE id = g.m2)
           |    - (SELECT lf FROM lf WHERE id = g.n1 - g.k)
           |    - (SELECT lf FROM lf WHERE id = g.m2 - g.n1 + g.k)
           |    - (SELECT lf FROM lf WHERE id = g.nn)
           |    + (SELECT lf FROM lf WHERE id = g.n1)
           |    + (SELECT lf FROM lf WHERE id = g.nn - g.n1) AS lnpk
           |  FROM grid g)
           |SELECT s AS event_type, a::BIGINT AS a, b::BIGINT AS b,
           |  c::BIGINT AS c, d::BIGINT AS d,
           |  round(a * d / nullif((b * c)::DOUBLE, 0), 4) AS odds_ratio,
           |  round(sum(CASE WHEN lnpk <= lnpobs + 1e-7
           |                 THEN exp(lnpk) END), 6) AS p_value
           |FROM terms GROUP BY s, a, b, c, d
           |ORDER BY event_type""".stripMargin))

  /** X193: Hampel filter over per-type daily counts — faithful
    * center-median MAD (the pair-join recomputation, not stacked
    * rolling medians); exact-integer inputs, interpolated medians. */
  private val q302 = Q("q302_hampel",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).as("x"))
      graft.events.Anomaly.hampel(daily, "event_type", "d", "x",
          halfWindow = 3)
        .orderBy($"event_type", $"d")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS k, ts::DATE AS d, count(*) AS x
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |idx AS (SELECT k, d, x::DOUBLE AS x,
           |    row_number() OVER (PARTITION BY k ORDER BY d) AS i
           |  FROM d),
           |pairs AS (SELECT a.k, a.i, a.d, a.x, b.x AS xj
           |  FROM idx a JOIN idx b ON a.k = b.k
           |    AND abs(a.i - b.i) <= 3),
           |med AS (SELECT k, i, median(xj) AS m
           |  FROM pairs GROUP BY 1, 2),
           |mad AS (SELECT p.k, p.i, median(abs(p.xj - med.m)) AS md
           |  FROM pairs p JOIN med ON med.k = p.k AND med.i = p.i
           |  GROUP BY 1, 2)
           |SELECT idx.k AS event_type, idx.d, idx.x,
           |  round(med.m, 6) AS roll_med, round(mad.md, 6) AS roll_mad,
           |  abs(idx.x - med.m) > 3 * 1.4826 * mad.md AS is_outlier
           |FROM idx
           |JOIN med ON med.k = idx.k AND med.i = idx.i
           |JOIN mad ON mad.k = idx.k AND mad.i = idx.i
           |ORDER BY event_type, d""".stripMargin))

  /** X194: Kendall τ-b per type between daily volume and daily value —
    * pairwise over the calendar-bounded daily aggregate, exact-integer
    * concordance counts with full tie correction. */
  private val q303 = Q("q303_kendall_tau",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).as("nv"),
          round(sum($"value"), 2).as("sv"))
      graft.ml.RankStats.kendallTauB(daily, "event_type", "nv", "sv")
        .orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS g, ts::DATE AS d, count(*) AS nv,
           |    round(sum(value), 2) AS sv
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |p AS (SELECT a.g,
           |    sign(b.nv - a.nv) * sign(b.sv - a.sv) AS sgn,
           |    a.nv = b.nv AS tx, a.sv = b.sv AS ty
           |  FROM d a JOIN d b ON a.g = b.g AND a.d < b.d),
           |agg AS (SELECT g, count(*) AS n0,
           |    count(CASE WHEN sgn > 0 THEN 1 END) AS c,
           |    count(CASE WHEN sgn < 0 THEN 1 END) AS dd,
           |    count(CASE WHEN tx THEN 1 END) AS ntx,
           |    count(CASE WHEN ty THEN 1 END) AS nty
           |  FROM p GROUP BY 1),
           |n AS (SELECT g, count(*) AS n FROM d GROUP BY 1)
           |SELECT agg.g AS event_type, n.n::BIGINT AS n,
           |  c::BIGINT AS n_concordant, dd::BIGINT AS n_discordant,
           |  round((c - dd) / nullif(sqrt((n0 - ntx)::DOUBLE *
           |    (n0 - nty)), 0), 4) AS tau_b
           |FROM agg JOIN n USING (g) ORDER BY event_type""".stripMargin))

  /** X195: PACF lags 1-3 (Durbin–Levinson closed forms) over per-type
    * daily counts — the AR-order diagnostic next to q143's ACF. */
  private val q304 = Q("q304_pacf",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).as("x"))
      graft.ml.TrendStats.pacf3(daily, "event_type", "d", "x")
        .orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS k, ts::DATE AS d, count(*) AS x
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |dev AS (SELECT k, d,
           |    x - avg(x) OVER (PARTITION BY k) AS dd
           |  FROM d),
           |c AS (SELECT k, d, dd,
           |    lag(dd, 1) OVER (PARTITION BY k ORDER BY d) AS d1,
           |    lag(dd, 2) OVER (PARTITION BY k ORDER BY d) AS d2,
           |    lag(dd, 3) OVER (PARTITION BY k ORDER BY d) AS d3
           |  FROM dev),
           |a AS (SELECT k, count(*) AS n, sum(dd * dd) AS g0,
           |    sum(dd * d1) AS g1, sum(dd * d2) AS g2,
           |    sum(dd * d3) AS g3
           |  FROM c GROUP BY 1),
           |r AS (SELECT k, n, g1 / nullif(g0, 0) AS r1,
           |    g2 / nullif(g0, 0) AS r2, g3 / nullif(g0, 0) AS r3
           |  FROM a),
           |f AS (SELECT k, n, r1, r2, r3,
           |    (r2 - r1 * r1) / nullif(1 - r1 * r1, 0) AS p22,
           |    r1 * (1 - r2) / nullif(1 - r1 * r1, 0) AS p21
           |  FROM r)
           |SELECT k AS event_type, n::BIGINT AS n,
           |  round(r1, 4) AS r1, round(r2, 4) AS r2,
           |  round(r3, 4) AS r3, round(r1, 4) AS pacf1,
           |  round(p22, 4) AS pacf2,
           |  round((r3 - p21 * r2 - p22 * r1) /
           |    nullif(1 - p21 * r1 - p22 * r2, 0), 4) AS pacf3
           |FROM f ORDER BY event_type""".stripMargin))

  /** X196: Chow structural-break F on orders (odd vs even order year)
    * — with d1 = 2 the F tail collapses to the closed form
    * x^(d2/2), x = d2/(d2 + 2F), so the oracle needs no special
    * functions (reg_inc_beta(x, a, 1) = x^a). */
  private val q305 = Q("q305_chow",
    (s, dir) => {
      import s.implicits._
      graft.ml.Regression.chowTest(
        t(s, dir, "orders").select(
          dayofmonth(to_date($"o_orderdate")).as("x"),
          $"o_totalprice".as("y"),
          (year(to_date($"o_orderdate")) % 2).cast("int").as("regime")),
        "y", "x", "regime")
    },
    Some("""WITH f AS (
           |  SELECT day(o_orderdate::DATE)::DOUBLE AS x, o_totalprice AS y,
           |    year(o_orderdate::DATE) % 2 AS r
           |  FROM orders
           |  WHERE o_totalprice IS NOT NULL
           |    AND o_orderdate IS NOT NULL),
           |a AS (SELECT count(*) AS n,
           |    count(CASE WHEN r = 0 THEN 1 END) AS n0,
           |    count(CASE WHEN r = 1 THEN 1 END) AS n1,
           |    sum(x) AS sxp, sum(y) AS syp, sum(x*x) AS sxxp,
           |    sum(x*y) AS sxyp, sum(y*y) AS syyp,
           |    sum(CASE WHEN r = 0 THEN x END) AS sx0,
           |    sum(CASE WHEN r = 0 THEN y END) AS sy0,
           |    sum(CASE WHEN r = 0 THEN x*x END) AS sxx0,
           |    sum(CASE WHEN r = 0 THEN x*y END) AS sxy0,
           |    sum(CASE WHEN r = 0 THEN y*y END) AS syy0,
           |    sum(CASE WHEN r = 1 THEN x END) AS sx1,
           |    sum(CASE WHEN r = 1 THEN y END) AS sy1,
           |    sum(CASE WHEN r = 1 THEN x*x END) AS sxx1,
           |    sum(CASE WHEN r = 1 THEN x*y END) AS sxy1,
           |    sum(CASE WHEN r = 1 THEN y*y END) AS syy1
           |  FROM f),
           |s AS (SELECT n, n0, n1,
           |    (syyp - syp*syp/n) - pow(sxyp - sxp*syp/n, 2) /
           |      nullif(sxxp - sxp*sxp/n, 0) AS ssrp,
           |    (syy0 - sy0*sy0/n0) - pow(sxy0 - sx0*sy0/n0, 2) /
           |      nullif(sxx0 - sx0*sx0/n0, 0) AS ssr0,
           |    (syy1 - sy1*sy1/n1) - pow(sxy1 - sx1*sy1/n1, 2) /
           |      nullif(sxx1 - sx1*sx1/n1, 0) AS ssr1
           |  FROM a),
           |ff AS (SELECT n, n0, n1,
           |    ((ssrp - ssr0 - ssr1) / 2) /
           |      nullif((ssr0 + ssr1) / nullif(n - 4.0, 0), 0) AS f
           |  FROM s)
           |SELECT n::BIGINT AS n, n0::BIGINT AS n_r0,
           |  n1::BIGINT AS n_r1, round(f, 4) AS f_stat,
           |  CASE WHEN n0 >= 3 AND n1 >= 3 AND f IS NOT NULL AND f >= 0
           |       THEN round(pow((n - 4.0) / (n - 4.0 + 2 * f),
           |                      (n - 4.0) / 2), 6) END AS p_value
           |FROM ff""".stripMargin))

  /** X197: Durbin–Watson serial-correlation diagnostic of the daily
    * value trend per type (y = 2dp daily sums, x = epoch day). */
  private val q306 = Q("q306_durbin_watson",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(round(sum($"value"), 2).as("y"))
        .withColumn("x", datediff($"d", lit("1970-01-01")).cast("double"))
      graft.ml.Regression.durbinWatson(daily, "event_type", "d", "y", "x")
        .orderBy($"event_type")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS k, ts::DATE AS d,
           |    round(sum(value), 2) AS y,
           |    date_diff('day', DATE '1970-01-01', ts::DATE)::DOUBLE AS x
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 4),
           |st AS (SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           |    sum(x*x) AS sxx, sum(x*y) AS sxy
           |  FROM d GROUP BY 1),
           |fit AS (SELECT k, n,
           |    (sxy - sx*sy/n) / nullif(sxx - sx*sx/n, 0) AS b,
           |    sy/n - ((sxy - sx*sy/n) / nullif(sxx - sx*sx/n, 0))
           |      * sx/n AS a
           |  FROM st),
           |e AS (SELECT d.k, d.d, d.y - fit.a - fit.b * d.x AS e,
           |    lag(d.y - fit.a - fit.b * d.x)
           |      OVER (PARTITION BY d.k ORDER BY d.d) AS el,
           |    fit.n, fit.b
           |  FROM d JOIN fit ON fit.k = d.k)
           |SELECT k AS event_type, max(n)::BIGINT AS n,
           |  round(max(b), 4) AS slope,
           |  round(sum(pow(e - el, 2)) / nullif(sum(e * e), 0), 4) AS dw
           |FROM e GROUP BY k ORDER BY event_type""".stripMargin))

  /** X198: Holm + Hochberg FWER adjustments (one sorted window pass;
    * the step-down/step-up companions to q15's BH). */
  private val q307 = Q("q307_holm_hochberg",
    (s, dir) => {
      import s.implicits._
      graft.de.Stats.holmHochberg(
        t(s, dir, "events").select($"event_id",
          round($"value" / 100.0, 6).as("p")),
        "p", Seq("event_id"))
        .select($"event_id", $"p", round($"holm", 6).as("holm"),
          round($"hochberg", 6).as("hochberg"))
        .orderBy($"event_id")
    },
    Some("""WITH p0 AS (
           |  SELECT event_id, round(value / 100.0, 6) AS p FROM events),
           |v AS (SELECT * FROM p0
           |      WHERE p IS NOT NULL AND NOT isnan(p)),
           |r AS (SELECT event_id, p,
           |    row_number() OVER (ORDER BY p, event_id) AS rk,
           |    count(*) OVER () AS m
           |  FROM v),
           |t AS (SELECT event_id, p, rk,
           |    least(1.0, (m - rk + 1) * p) AS term
           |  FROM r),
           |adj AS (SELECT event_id, p,
           |    round(max(term) OVER (ORDER BY rk
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
           |      AS holm,
           |    round(min(term) OVER (ORDER BY rk DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
           |      AS hochberg
           |  FROM t)
           |-- null/NaN p-values pass through unadjusted and are NOT
           |-- counted in m (the operator's stated complete-case family
           |-- size; the fuzz-13 divergence was this oracle counting them)
           |SELECT event_id, p, holm, hochberg FROM adj
           |UNION ALL
           |SELECT event_id, p, NULL, NULL FROM p0
           |WHERE p IS NULL OR isnan(p)
           |ORDER BY event_id""".stripMargin))

  /** X199: Harrell's concordance index per user cohort — duration =
    * user's first-to-last-event minutes, event = saw an error, risk
    * score = total value; pairwise over the bounded cohort grain. */
  private val q308 = Q("q308_c_index",
    (s, dir) => {
      import s.implicits._
      val subj = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"user_id")
        // integer-minute durations (floor division, matching the
        // oracle's `//`): same-minute spans are TIES, not ordered
        // pairs — the fractional-vs-floored divergence only shows when
        // two subjects share a minute (sf1 finding, round 11)
        .agg(floor((unix_micros(max($"ts")) - unix_micros(min($"ts"))) /
          60000000L).cast("long").as("dur"),
          max(when($"event_type" === "error", 1).otherwise(0)).as("ev"),
          round(sum($"value"), 2).as("score"))
        .withColumn("cohort", pmod($"user_id", lit(8)).cast("int"))
      graft.de.Survival.concordanceIndex(subj, "cohort", "dur", "ev",
          "score")
        .orderBy($"cohort")
    },
    Some("""WITH subj AS (
           |  SELECT user_id, (user_id % 8)::INT AS cohort,
           |    (epoch_us(max(ts)) - epoch_us(min(ts))) // 60000000
           |      AS dur,
           |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           |      AS ev,
           |    round(sum(value), 2) AS score
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |p AS (SELECT i.cohort,
           |    CASE WHEN i.score > j.score THEN 1 ELSE 0 END AS conc,
           |    CASE WHEN i.score = j.score THEN 1 ELSE 0 END AS tie
           |  FROM subj i JOIN subj j ON i.cohort = j.cohort
           |  WHERE i.ev = 1 AND i.dur < j.dur),
           |n AS (SELECT cohort, count(*) AS n FROM subj GROUP BY 1)
           |SELECT p.cohort, n.n::BIGINT AS n,
           |  count(*)::BIGINT AS n_pairs,
           |  sum(conc)::BIGINT AS n_concordant,
           |  sum(tie)::BIGINT AS n_tied,
           |  round((sum(conc) + sum(tie) / 2.0) /
           |    nullif(count(*), 0), 4) AS c_index
           |FROM p JOIN n USING (cohort)
           |GROUP BY p.cohort, n.n ORDER BY cohort""".stripMargin))

  /** X200: Atkinson inequality index (ε = 1, geometric-mean EDE) of
    * order value per priority class — the welfare-grounded member
    * next to q165's Gini. */
  private val q309 = Q("q309_atkinson",
    (s, dir) => {
      import s.implicits._
      graft.report.Inequality.atkinson(t(s, dir, "orders"),
          "o_orderpriority", "o_totalprice")
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  count(CASE WHEN o_totalprice > 0 THEN 1 END)::BIGINT AS n,
           |  count(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
           |             THEN 1 END)::BIGINT AS n_nonpos,
           |  round(avg(CASE WHEN o_totalprice > 0
           |                 THEN o_totalprice END), 4) AS mean,
           |  round(exp(avg(CASE WHEN o_totalprice > 0
           |                     THEN ln(o_totalprice) END)), 4) AS ede,
           |  round(1 - exp(avg(CASE WHEN o_totalprice > 0
           |                        THEN ln(o_totalprice) END)) /
           |    avg(CASE WHEN o_totalprice > 0 THEN o_totalprice END), 6)
           |    AS atkinson
           |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin))

  /** X201: directly standardized finished-order rates per priority,
    * reweighted to the pooled order-year mix — composition-adjusted
    * comparison, the epidemiology classic. */
  private val q310 = Q("q310_std_rates",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.standardizedRates(
        t(s, dir, "orders").select($"o_orderpriority",
          year(to_date($"o_orderdate")).as("yr"),
          ($"o_orderstatus" === "F").cast("int").as("ev")),
        "o_orderpriority", "yr", "ev")
        .orderBy($"o_orderpriority")
    },
    Some("""WITH cell AS (
           |  SELECT o_orderpriority AS g, year(o_orderdate::DATE) AS s,
           |    count(*) AS n,
           |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x
           |  FROM orders GROUP BY 1, 2),
           |ref AS (SELECT s, sum(n) AS ns FROM cell GROUP BY 1),
           |tot AS (SELECT sum(ns) AS nt FROM ref),
           |k AS (SELECT count(*) AS k FROM ref)
           |SELECT g AS o_orderpriority, sum(cell.n)::BIGINT AS n,
           |  round(sum(cell.x)::DOUBLE / sum(cell.n), 6) AS crude_rate,
           |  CASE WHEN count(*) = (SELECT k FROM k)
           |       THEN round(sum((cell.x::DOUBLE / cell.n) * ref.ns /
           |                      (SELECT nt FROM tot)), 6) END
           |    AS std_rate
           |FROM cell JOIN ref USING (s)
           |GROUP BY g ORDER BY o_orderpriority""".stripMargin))

  /** X202: Mantel–Haenszel pooled odds ratio + CMH χ² over per-type
    * 2×2 strata (the stratified sibling of q301's Fisher exact). The
    * oracle compares the exact-arithmetic columns; the χ²→p tail is
    * spec-pinned against R's pchisq instead (DuckDB ships no
    * erfc/normal CDF to compare against). */
  private val q311 = Q("q311_mantel_haenszel",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.mantelHaenszel(
        t(s, dir, "events").select($"event_type",
          pmod($"event_id", lit(2)).cast("int").as("x"),
          when($"event_id" % 3 === 0, 1).otherwise(0).as("y")),
        "event_type", "x", "y")
        .drop("p_value")
    },
    Some("""WITH cell AS (
           |  SELECT event_type,
           |    count(CASE WHEN event_id % 2 = 1 AND event_id % 3 = 0
           |               THEN 1 END) AS a,
           |    count(CASE WHEN event_id % 2 = 1 AND event_id % 3 <> 0
           |               THEN 1 END) AS b,
           |    count(CASE WHEN event_id % 2 = 0 AND event_id % 3 = 0
           |               THEN 1 END) AS c,
           |    count(CASE WHEN event_id % 2 = 0 AND event_id % 3 <> 0
           |               THEN 1 END) AS d
           |  FROM events GROUP BY 1),
           |m AS (SELECT *, (a + b + c + d)::DOUBLE AS n,
           |    (a + b)::DOUBLE AS m1, (c + d)::DOUBLE AS m0,
           |    (a + c)::DOUBLE AS n1, (b + d)::DOUBLE AS n0
           |  FROM cell),
           |agg AS (SELECT count(*) AS n_strata, sum(n)::BIGINT AS nn,
           |    sum(a * d / n) AS num, sum(b * c / n) AS den,
           |    sum(a)::DOUBLE AS sa, sum(m1 * n1 / n) AS se,
           |    sum(CASE WHEN n > 1
           |             THEN m1 * m0 * n1 * n0 / (n * n * (n - 1))
           |             ELSE 0 END) AS sv
           |  FROM m)
           |SELECT n_strata::BIGINT AS n_strata, nn AS n,
           |  round(num / nullif(den, 0), 4) AS or_mh,
           |  round(pow(sa - se, 2) / nullif(sv, 0), 4) AS chi2
           |FROM agg""".stripMargin))

  /** X203: KMV set operations — distinct/overlap/Jaccard estimates
    * between the parts referenced by lineitem and the part dimension,
    * from bottom-k md5 signatures (bit-replayable: the oracle rebuilds
    * the identical sketch with md5_number_lower). */
  private val q312 = Q("q312_kmv_set_ops",
    (s, dir) => {
      import s.implicits._
      graft.sketch.Sketches.kmvSetOps(
        t(s, dir, "lineitem").select($"l_partkey".as("v")),
        t(s, dir, "part").select($"p_partkey".as("v")),
        "v", k = 256)
    },
    Some("""WITH ha AS (SELECT DISTINCT
           |    md5_number_lower(CAST(l_partkey AS VARCHAR)) AS hu
           |  FROM lineitem),
           |hb AS (SELECT DISTINCT
           |    md5_number_lower(CAST(p_partkey AS VARCHAR)) AS hu
           |  FROM part),
           |u AS (SELECT hu, max(ina) AS ina, max(inb) AS inb FROM (
           |    SELECT hu, 1 AS ina, 0 AS inb FROM ha
           |    UNION ALL SELECT hu, 0, 1 FROM hb) GROUP BY hu),
           |ra AS (SELECT hu, row_number() OVER (ORDER BY hu) AS r
           |       FROM ha),
           |rb AS (SELECT hu, row_number() OVER (ORDER BY hu) AS r
           |       FROM hb),
           |ru AS (SELECT hu, ina, inb,
           |         row_number() OVER (ORDER BY hu) AS r FROM u),
           |n AS (SELECT (SELECT count(*) FROM ha) AS na,
           |        (SELECT count(*) FROM hb) AS nb,
           |        (SELECT count(*) FROM u) AS nu),
           |es AS (SELECT
           |    coalesce((SELECT 255 * 18446744073709551616.0 / hu::DOUBLE
           |              FROM ra WHERE r = 256), (SELECT na FROM n))
           |      AS est_a,
           |    coalesce((SELECT 255 * 18446744073709551616.0 / hu::DOUBLE
           |              FROM rb WHERE r = 256), (SELECT nb FROM n))
           |      AS est_b,
           |    coalesce((SELECT 255 * 18446744073709551616.0 / hu::DOUBLE
           |              FROM ru WHERE r = 256), (SELECT nu FROM n))
           |      AS est_u,
           |    least(256, (SELECT nu FROM n)) AS k_used,
           |    (SELECT count(*) FROM ru
           |     WHERE r <= 256 AND ina = 1 AND inb = 1) AS rho)
           |SELECT k_used::BIGINT AS k_used, round(est_a, 4) AS est_a,
           |  round(est_b, 4) AS est_b, round(est_u, 4) AS est_union,
           |  rho::BIGINT AS rho,
           |  round(rho / k_used::DOUBLE, 4) AS jaccard_est,
           |  round(rho / k_used::DOUBLE * est_u, 4) AS est_intersection
           |FROM es""".stripMargin))

  /** X204: prefix dedup — "same article, different tail" groups via
    * the md5 of the first 30 tokens, with the tail-length spread. */
  private val q313 = Q("q313_prefix_groups",
    (s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.prefixGroups(t(s, dir, "documents"),
          "doc_id", "text", nTokens = 30)
        .orderBy($"prefix_md5")
    },
    Some("""WITH p AS (
           |  SELECT doc_id, text,
           |    CASE WHEN text IS NULL THEN NULL
           |         ELSE md5(coalesce(array_to_string(
           |           regexp_extract_all(text, '\S+')[1:30], ' '), ''))
           |    END AS pm
           |  FROM documents)
           |SELECT pm AS prefix_md5, min(doc_id)::BIGINT AS keep_id,
           |  count(*)::BIGINT AS n_dups,
           |  min(length(text))::INT AS min_len,
           |  max(length(text))::INT AS max_len
           |FROM p GROUP BY pm ORDER BY prefix_md5""".stripMargin))

  /** X205: template mining — top masked line patterns (digit runs →
    * '#', hex runs → '@'), the Drain-style log triage done
    * relationally. */
  private val q314 = Q("q314_templates",
    (s, dir) => {
      import s.implicits._
      graft.text.TextAnalysis.templateMiner(t(s, dir, "documents"),
          "doc_id", "text", topK = 20)
        .orderBy($"rank")
    },
    Some("""WITH l AS (
           |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
           |  FROM documents),
           |f AS (SELECT doc_id,
           |    regexp_replace(regexp_replace(line, '[0-9a-f]{8,}', '@',
           |      'g'), '[0-9]+', '#', 'g') AS pattern
           |  FROM l WHERE length(trim(line)) > 0),
           |c AS (SELECT pattern, count(*) AS n_lines,
           |        count(DISTINCT doc_id) AS n_docs
           |      FROM f GROUP BY 1)
           |SELECT pattern, n_lines::BIGINT AS n_lines,
           |  n_docs::BIGINT AS n_docs,
           |  (row_number() OVER (ORDER BY n_lines DESC, pattern))::INT
           |    AS rank
           |FROM c QUALIFY rank <= 20 ORDER BY rank""".stripMargin))

  /** X206: G-test of independence (2N·MI identity) next to Pearson. */
  private val q315 = Q("q315_g_test",
    (s, dir) => {
      import s.implicits._
      graft.de.InfoTheory.gTest(
        t(s, dir, "events").select($"event_type",
          pmod($"event_id", lit(3)).as("m3")),
        "event_type", "m3")
    },
    Some("""WITH cells AS (
           |  SELECT event_type AS x, event_id % 3 AS y, count(*) AS c
           |  FROM events
           |  WHERE event_type IS NOT NULL AND event_id IS NOT NULL
           |  GROUP BY 1, 2),
           |mx AS (SELECT x, sum(c) AS cx FROM cells GROUP BY 1),
           |my AS (SELECT y, sum(c) AS cy FROM cells GROUP BY 1),
           |n AS (SELECT sum(c) AS n,
           |        (SELECT count(*) FROM mx) AS nx,
           |        (SELECT count(*) FROM my) AS ny FROM cells)
           |SELECT (SELECT n FROM n)::BIGINT AS n,
           |  ((SELECT nx FROM n) - 1) * ((SELECT ny FROM n) - 1)
           |    AS df,
           |  round(2.0 * sum(c * ln(c /
           |    (mx.cx::DOUBLE * my.cy / (SELECT n FROM n)))), 4) AS g,
           |  round(sum(pow(c - mx.cx::DOUBLE * my.cy /
           |    (SELECT n FROM n), 2) /
           |    (mx.cx::DOUBLE * my.cy / (SELECT n FROM n))), 4)
           |    AS pearson_chi2
           |FROM cells JOIN mx USING (x) JOIN my USING (y)""".stripMargin))

  /** X207: McNemar's paired test — per user-cohort, did users who
    * clicked also purchase (pre = clicked, post = purchased). */
  private val q316 = Q("q316_mcnemar",
    (s, dir) => {
      import s.implicits._
      val users = t(s, dir, "events").groupBy($"user_id")
        .agg(max(when($"event_type" === "click", 1).otherwise(0))
          .as("pre"),
          max(when($"event_type" === "purchase", 1).otherwise(0))
            .as("post"))
        .withColumn("cohort", pmod($"user_id", lit(4)).cast("int"))
      graft.de.Experiment.mcnemar(users, "cohort", "pre", "post")
        .orderBy($"cohort")
    },
    Some("""WITH u AS (
           |  SELECT user_id, (user_id % 4)::INT AS cohort,
           |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           |      AS pre,
           |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS post
           |  FROM events GROUP BY 1, 2)
           |SELECT cohort, count(*)::BIGINT AS n,
           |  count(CASE WHEN pre = 1 AND post = 0 THEN 1 END)::BIGINT
           |    AS b,
           |  count(CASE WHEN pre = 0 AND post = 1 THEN 1 END)::BIGINT
           |    AS c,
           |  round(pow(count(CASE WHEN pre = 1 AND post = 0 THEN 1 END)
           |          - count(CASE WHEN pre = 0 AND post = 1 THEN 1 END),
           |        2) /
           |    nullif(count(CASE WHEN pre = 1 AND post = 0 THEN 1 END)
           |         + count(CASE WHEN pre = 0 AND post = 1 THEN 1 END),
           |         0)::DOUBLE, 4) AS chi2,
           |  round(pow(greatest(abs(
           |      count(CASE WHEN pre = 1 AND post = 0 THEN 1 END)
           |    - count(CASE WHEN pre = 0 AND post = 1 THEN 1 END)) - 1,
           |      0), 2) /
           |    nullif(count(CASE WHEN pre = 1 AND post = 0 THEN 1 END)
           |         + count(CASE WHEN pre = 0 AND post = 1 THEN 1 END),
           |         0)::DOUBLE, 4) AS chi2_cc
           |FROM u GROUP BY cohort ORDER BY cohort""".stripMargin))

  /** X208: Cohen's h effect size — high-quantity rate A vs N flag per
    * linestatus (arcsine scale). */
  private val q317 = Q("q317_cohens_h",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.cohensH(
        t(s, dir, "lineitem").select($"l_linestatus", $"l_returnflag",
          ($"l_quantity" > 25).cast("long").as("hi")),
        "l_linestatus", "l_returnflag", "hi", "A", "N")
        .orderBy($"l_linestatus")
    },
    Some("""SELECT l_linestatus,
           |  count(CASE WHEN l_returnflag = 'A' THEN 1 END)::BIGINT
           |    AS n_a,
           |  count(CASE WHEN l_returnflag = 'N' THEN 1 END)::BIGINT
           |    AS n_b,
           |  round(sum(CASE WHEN l_returnflag = 'A' AND l_quantity > 25
           |                 THEN 1 ELSE 0 END)::DOUBLE /
           |    nullif(count(CASE WHEN l_returnflag = 'A' THEN 1 END), 0),
           |    6) AS p_a,
           |  round(sum(CASE WHEN l_returnflag = 'N' AND l_quantity > 25
           |                 THEN 1 ELSE 0 END)::DOUBLE /
           |    nullif(count(CASE WHEN l_returnflag = 'N' THEN 1 END), 0),
           |    6) AS p_b,
           |  round(2 * asin(sqrt(
           |      sum(CASE WHEN l_returnflag = 'A' AND l_quantity > 25
           |          THEN 1 ELSE 0 END)::DOUBLE /
           |      nullif(count(CASE WHEN l_returnflag = 'A' THEN 1 END),
           |             0)))
           |    - 2 * asin(sqrt(
           |      sum(CASE WHEN l_returnflag = 'N' AND l_quantity > 25
           |          THEN 1 ELSE 0 END)::DOUBLE /
           |      nullif(count(CASE WHEN l_returnflag = 'N' THEN 1 END),
           |             0))), 4) AS cohens_h
           |FROM lineitem WHERE l_returnflag IN ('A', 'N')
           |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))

  /** X209: run-length statistics — per (user-cohort, state) event-type
    * persistence. Keyed per user then re-aggregated to cohorts for a
    * bounded result. */
  private val q318 = Q("q318_run_lengths",
    (s, dir) => {
      import s.implicits._
      graft.events.Sessionize.runLengths(t(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type")
        .groupBy(pmod($"user_id", lit(4)).cast("int").as("cohort"),
          $"state")
        .agg(sum($"n_events").as("n_events"),
          sum($"n_runs").as("n_runs"),
          round(sum($"n_events") / sum($"n_runs").cast("double"), 4)
            .as("events_per_run"),
          max($"max_run_len").as("max_run_len"))
        .orderBy($"cohort", $"state")
    },
    Some("""WITH r AS (
           |  SELECT user_id, event_type AS state, ts, event_id,
           |    CASE WHEN lag(event_type) OVER w IS NULL
           |         OR lag(event_type) OVER w <> event_type
           |         THEN 1 ELSE 0 END AS is_new
           |  FROM events WHERE ts IS NOT NULL
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |runs AS (SELECT user_id, state,
           |    sum(is_new) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS run
           |  FROM r),
           |g AS (SELECT user_id, state, run, count(*) AS len
           |      FROM runs GROUP BY 1, 2, 3)
           |SELECT (user_id % 4)::INT AS cohort, state,
           |  sum(len)::BIGINT AS n_events, count(*)::BIGINT AS n_runs,
           |  round(sum(len) / count(*)::DOUBLE, 4) AS events_per_run,
           |  max(len)::BIGINT AS max_run_len
           |FROM g GROUP BY 1, 2 ORDER BY cohort, state""".stripMargin))

  /** X210: multiplicative seasonal index (ratio-to-MA, m = 7) of daily
    * volume per type — "Mondays run at 0.9× trend". */
  private val q319 = Q("q319_seasonal_index",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).as("x"))
      graft.events.Decompose.multiplicativeIndex(daily, "event_type",
          "d", "x", m = 7)
        .orderBy($"event_type", $"phase")
    },
    Some("""WITH d AS (
           |  SELECT event_type AS k, ts::DATE AS d, count(*) AS x
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |b AS (SELECT k, d, x,
           |    row_number() OVER (PARTITION BY k ORDER BY d) - 1 AS i,
           |    count(*) OVER (PARTITION BY k) AS n,
           |    sum(x) OVER (PARTITION BY k ORDER BY d
           |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7
           |  FROM d),
           |t AS (SELECT k, i % 7 AS phase, x,
           |    CASE WHEN i >= 3 AND i < n - 3 THEN s7 / 7.0 END AS tr
           |  FROM b),
           |r AS (SELECT k, phase, count(*) AS n_obs,
           |        avg(x / tr) AS rr
           |      FROM t WHERE tr IS NOT NULL AND tr <> 0 GROUP BY 1, 2),
           |c AS (SELECT k, avg(rr) AS c FROM r GROUP BY 1)
           |SELECT r.k AS event_type, phase::BIGINT AS phase,
           |  n_obs::BIGINT AS n_obs,
           |  round(rr / nullif(c.c, 0), 6) AS seasonal_index
           |FROM r JOIN c ON c.k = r.k
           |ORDER BY event_type, phase""".stripMargin))

  /** X211: Woolf odds-ratio CI per event type (the CI next to q311's
    * pooled point estimate). */
  private val q320 = Q("q320_odds_ratio_ci",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.oddsRatioCi(
        t(s, dir, "events").select($"event_type",
          pmod($"event_id", lit(2)).cast("int").as("x"),
          when($"event_id" % 3 === 0, 1).otherwise(0).as("y")),
        "event_type", "x", "y")
        .orderBy($"event_type")
    },
    Some("""WITH cell AS (
           |  SELECT event_type,
           |    count(CASE WHEN event_id % 2 = 1 AND event_id % 3 = 0
           |               THEN 1 END) AS a,
           |    count(CASE WHEN event_id % 2 = 1 AND event_id % 3 <> 0
           |               THEN 1 END) AS b,
           |    count(CASE WHEN event_id % 2 = 0 AND event_id % 3 = 0
           |               THEN 1 END) AS c,
           |    count(CASE WHEN event_id % 2 = 0 AND event_id % 3 <> 0
           |               THEN 1 END) AS d
           |  FROM events GROUP BY 1)
           |SELECT event_type, a::BIGINT AS a, b::BIGINT AS b,
           |  c::BIGINT AS c, d::BIGINT AS d,
           |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
           |    round(a * d / (b * c)::DOUBLE, 4) END AS odds_ratio,
           |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
           |    round(exp(ln(a * d / (b * c)::DOUBLE) - 1.959964 *
           |      sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 4) END AS ci_lo,
           |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
           |    round(exp(ln(a * d / (b * c)::DOUBLE) + 1.959964 *
           |      sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 4) END AS ci_hi
           |FROM cell ORDER BY event_type""".stripMargin))

  /** X212: Kitagawa / Oaxaca–Blinder mix-rate decomposition of the
    * even→odd user-cohort mean-value change, stratified by event type
    * (mix + rate + interaction sum exactly to delta). */
  private val q321 = Q("q321_mix_decomposition",
    (s, dir) => {
      import s.implicits._
      graft.de.Experiment.mixDecomposition(
        t(s, dir, "events").select(
          pmod($"user_id", lit(2)).cast("int").as("period"),
          $"event_type", $"value"),
        "period", "event_type", "value")
    },
    Some("""WITH cell AS (
           |  SELECT event_type,
           |    count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n0,
           |    sum(CASE WHEN user_id % 2 = 0 THEN value END) AS x0,
           |    count(CASE WHEN user_id % 2 = 1 THEN 1 END) AS n1,
           |    sum(CASE WHEN user_id % 2 = 1 THEN value END) AS x1
           |  FROM events GROUP BY 1),
           |t AS (SELECT sum(n0) AS t0, sum(n1) AS t1 FROM cell),
           |e AS (SELECT n0 / t0::DOUBLE AS w0, n1 / t1::DOUBLE AS w1,
           |    coalesce(x0 / nullif(n0, 0)::DOUBLE,
           |             x1 / nullif(n1, 0)::DOUBLE) AS r0,
           |    coalesce(x1 / nullif(n1, 0)::DOUBLE,
           |             x0 / nullif(n0, 0)::DOUBLE) AS r1,
           |    t0, t1
           |  FROM cell CROSS JOIN t)
           |SELECT max(t0)::BIGINT AS n_0, max(t1)::BIGINT AS n_1,
           |  round(sum(w0 * r0), 6) AS mean_0,
           |  round(sum(w1 * r1), 6) AS mean_1,
           |  round(sum(w1 * r1) - sum(w0 * r0), 6) AS delta,
           |  round(sum((w1 - w0) * r0), 6) AS mix_effect,
           |  round(sum(w0 * (r1 - r0)), 6) AS rate_effect,
           |  round(sum((w1 - w0) * (r1 - r0)), 6) AS interaction
           |FROM e""".stripMargin))

  val all: Seq[Q] = Seq(q285, q286, q287, q288, q289, q290, q291,
    q292, q293, q294, q295, q296, q297, q298, q299, q300, q301,
    q302, q303, q304, q305, q306, q307, q308, q309, q310, q311,
    q312, q313, q314, q315, q316, q317, q318, q319, q320, q321)
}
