package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch U (X136+): identity
  * stitching over the shared-device bipartite graph (q32's recursive
  * closure as the oracle), RAKE keyword extraction, an
  * ecological-diversity battery, Croston intermittent-demand
  * forecasting (recursive-CTE state replay), and inter-purchase gap
  * statistics.
  */
object CatalogText2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X136: identity stitching — users sharing a device (props.k) merge
    * into one canonical identity via connected components over the
    * bipartite user–device graph (device node ids offset by 1e6 into
    * the same key space; component root = min id = min user id).
    * [[graft.dedup.Dedup.connectedComponents]] size-dispatches, so the
    * same call is the 100-TB path. */
  private val q246 = Q("q246_identity_stitch",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val uk = t(s, dir, "events")
        .select($"user_id",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .filter($"k".isNotNull).distinct()
      val edges = uk.select($"user_id".as("id_a"),
        ($"k" + 1000000L).as("id_b"))
      graft.dedup.Dedup.connectedComponents(edges)
        .filter($"id" < 1000000L)
        .select($"id".as("user_id"), $"component".as("canonical"))
        .withColumn("cluster_users",
          count(lit(1)).over(Window.partitionBy($"canonical")))
        .orderBy($"user_id")
    },
    Some("""WITH RECURSIVE uk AS (
           |  SELECT DISTINCT user_id,
           |    json_extract_string(props, '$.k')::BIGINT + 1000000 AS d
           |  FROM events
           |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
           |edges AS (SELECT user_id AS u, d AS v FROM uk
           |          UNION ALL SELECT d, user_id FROM uk),
           |nodes AS (SELECT DISTINCT u AS id FROM edges),
           |reach AS (SELECT id, id AS r FROM nodes
           |          UNION
           |          SELECT t.id, e.v FROM reach t
           |          JOIN edges e ON e.u = t.r),
           |comp AS (SELECT id, min(r) AS canonical FROM reach GROUP BY id)
           |SELECT id AS user_id, canonical,
           |  count(*) OVER (PARTITION BY canonical)::BIGINT
           |    AS cluster_users
           |FROM comp WHERE id < 1000000 ORDER BY user_id""".stripMargin))

  /** X137: RAKE keyword extraction
    * ([[graft.text.TextAnalysis.rakeKeywords]], q22's stopword list,
    * phrases ≤ 3 words, corpus top-25) — gap-and-islands phrase
    * splitting replayed identically in SQL. */
  private val q247 = Q("q247_rake_keywords",
    (s, dir) => {
      import s.implicits._
      graft.text.TextAnalysis.rakeKeywords(t(s, dir, "documents"),
          "doc_id", "text", Seq("the", "a", "is", "and", "of"),
          maxPhraseLen = 3, topK = 25)
        .orderBy($"rank")
    },
    Some("""WITH tk AS (
           |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS l
           |  FROM documents),
           |tok AS (
           |  SELECT doc_id, unnest(l) AS w,
           |    unnest(range(1, len(l) + 1)) AS pos
           |  FROM tk),
           |mk AS (
           |  SELECT doc_id, w, pos,
           |    w IN ('the', 'a', 'is', 'and', 'of') AS stop
           |  FROM tok),
           |ph AS (
           |  SELECT doc_id,
           |    sum(CASE WHEN stop THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY doc_id ORDER BY pos) AS pid,
           |    w, pos, stop
           |  FROM mk),
           |phr AS (
           |  SELECT doc_id, pid,
           |    string_agg(w, ' ' ORDER BY pos) AS phrase,
           |    count(*)::BIGINT AS len
           |  FROM ph WHERE NOT stop GROUP BY doc_id, pid
           |  HAVING count(*) <= 3),
           |words AS (
           |  SELECT unnest(string_split(phrase, ' ')) AS w, len
           |  FROM phr),
           |ws AS (
           |  SELECT w, sum(len)::DOUBLE / count(*) AS score
           |  FROM words GROUP BY w),
           |dp AS (
           |  SELECT phrase, count(*)::BIGINT AS n_occurrences,
           |    max(len)::BIGINT AS n_words
           |  FROM phr GROUP BY phrase),
           |sc AS (
           |  SELECT dp.phrase, dp.n_words, dp.n_occurrences,
           |    round(sum(ws.score), 4) AS score
           |  FROM dp, unnest(string_split(dp.phrase, ' ')) AS u(w)
           |  JOIN ws ON ws.w = u.w
           |  GROUP BY 1, 2, 3)
           |SELECT phrase, n_words, n_occurrences, score,
           |  row_number() OVER (ORDER BY score DESC, phrase) AS rank
           |FROM sc ORDER BY score DESC, phrase LIMIT 25""".stripMargin))

  /** X138: ecological-diversity battery
    * ([[graft.text.CorpusStats.diversityIndexes]]) of each source's
    * unigram distribution. */
  private val q248 = Q("q248_diversity",
    (s, dir) => {
      import s.implicits._
      graft.text.CorpusStats.diversityIndexes(t(s, dir, "documents"),
          "source", "text")
        .orderBy($"stratum")
    },
    Some("""WITH c AS (
           |  SELECT source AS stratum,
           |    unnest(regexp_extract_all(text, '\S+')) AS term
           |  FROM documents),
           |g AS (SELECT stratum, term, count(*)::BIGINT AS n
           |      FROM c GROUP BY 1, 2)
           |SELECT stratum, count(*)::BIGINT AS n_types,
           |  sum(n)::BIGINT AS n_tokens,
           |  round(ln(sum(n)::DOUBLE)
           |    - sum(n::DOUBLE * ln(n::DOUBLE)) / sum(n)::DOUBLE, 4)
           |    AS shannon,
           |  round(exp(ln(sum(n)::DOUBLE)
           |    - sum(n::DOUBLE * ln(n::DOUBLE)) / sum(n)::DOUBLE), 4)
           |    AS eff_species,
           |  round(sum(n * (n - 1))::DOUBLE
           |    / (sum(n)::DOUBLE * (sum(n) - 1)), 6) AS simpson,
           |  round(1.0 / (sum(n::DOUBLE * n)
           |    / (sum(n)::DOUBLE * sum(n)::DOUBLE)), 4) AS inv_simpson
           |FROM g GROUP BY stratum ORDER BY stratum""".stripMargin))

  /** X139: Croston intermittent demand
    * ([[graft.events.Ewma.croston]], α = 0.3) on each part's daily
    * order-quantity series — mostly-zero demand is the realistic
    * spare-parts shape; the oracle replays the exact (z, p, q) state
    * recurrence in a recursive CTE (the q146/q163 technique). Demand
    * days come from a dense calendar join so zero periods exist on
    * both engines identically. */
  private val q249 = Q("q249_croston",
    (s, dir) => {
      import s.implicits._
      // weekly buckets for a bounded series; parts sampled to keep the
      // catalog row count stable
      val li = t(s, dir, "lineitem")
        .filter($"l_partkey" % 97 === 0 && $"l_shipdate".isNotNull)
        .groupBy($"l_partkey",
          date_trunc("week", $"l_shipdate").as("wk"))
        .agg(round(sum($"l_quantity")).cast("long").as("q"))
      val weeks = li.select($"wk").distinct()
      val parts = li.select($"l_partkey").distinct()
      val grid = parts.crossJoin(weeks)
      val series = grid.join(li, Seq("l_partkey", "wk"), "left")
        .select($"l_partkey", $"wk", coalesce($"q", lit(0L)).as("q"))
      graft.events.Ewma.croston(series, "l_partkey", "wk", "q",
          alpha = 0.3)
        .orderBy($"l_partkey")
    },
    Some("""WITH RECURSIVE li AS (
           |  SELECT l_partkey, date_trunc('week', l_shipdate) AS wk,
           |    round(sum(l_quantity))::BIGINT AS q
           |  FROM lineitem WHERE l_partkey % 97 = 0
           |    AND l_shipdate IS NOT NULL GROUP BY 1, 2),
           |wks AS (SELECT DISTINCT wk FROM li),
           |pts AS (SELECT DISTINCT l_partkey FROM li),
           |series AS (
           |  SELECT p.l_partkey, w.wk, coalesce(li.q, 0) AS q
           |  FROM pts p CROSS JOIN wks w
           |  LEFT JOIN li ON li.l_partkey = p.l_partkey AND li.wk = w.wk),
           |r AS (
           |  SELECT l_partkey, q::DOUBLE AS x,
           |    row_number() OVER (PARTITION BY l_partkey ORDER BY wk)
           |      AS rn
           |  FROM series),
           |st AS (
           |  SELECT l_partkey, rn,
           |    CASE WHEN x = 0 THEN -1.0::DOUBLE ELSE x END AS z,
           |    CASE WHEN x = 0 THEN 0.0::DOUBLE ELSE rn::DOUBLE END AS p,
           |    CASE WHEN x = 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS gq,
           |    CASE WHEN x = 0 THEN 0 ELSE 1 END AS m
           |  FROM r WHERE rn = 1
           |  UNION ALL
           |  SELECT r.l_partkey, r.rn,
           |    CASE WHEN r.x = 0 THEN st.z
           |         WHEN st.z < 0 THEN r.x
           |         ELSE 0.3 * r.x + (1.0 - 0.3) * st.z END,
           |    CASE WHEN r.x = 0 THEN st.p
           |         WHEN st.z < 0 THEN st.gq + 1.0
           |         ELSE 0.3 * (st.gq + 1.0) + (1.0 - 0.3) * st.p END,
           |    CASE WHEN r.x = 0 THEN st.gq + 1.0 ELSE 0.0 END,
           |    CASE WHEN r.x = 0 THEN st.m ELSE st.m + 1 END
           |  FROM st JOIN r ON r.l_partkey = st.l_partkey
           |               AND r.rn = st.rn + 1),
           |f AS (SELECT l_partkey, max(rn) AS n FROM st GROUP BY 1)
           |SELECT st.l_partkey, f.n::BIGINT AS n, st.m::BIGINT AS n_demands,
           |  CASE WHEN st.z >= 0 THEN round(st.z, 6) END AS size_z,
           |  CASE WHEN st.z >= 0 THEN round(st.p, 6) END AS interval_p,
           |  CASE WHEN st.z >= 0 THEN round(st.z / st.p, 6) END
           |    AS forecast
           |FROM st JOIN f ON f.l_partkey = st.l_partkey AND st.rn = f.n
           |ORDER BY st.l_partkey""".stripMargin))

  /** X140: inter-purchase gap statistics per market segment — lag
    * window per customer, exact-day gaps, grouped mean/median/p90. */
  private val q250 = Q("q250_purchase_gaps",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      val gaps = t(s, dir, "orders")
        .withColumn("prev", lag($"o_orderdate", 1).over(w))
        .filter($"prev".isNotNull)
        .select($"o_custkey",
          datediff($"o_orderdate", $"prev").cast("long").as("gap"))
      gaps.join(broadcast(t(s, dir, "customer")),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_gaps"),
          round(avg($"gap"), 4).as("mean_gap"),
          round(percentile($"gap", lit(0.5)), 4).as("median_gap"),
          round(percentile($"gap", lit(0.9)), 4).as("p90_gap"))
        .orderBy($"c_mktsegment")
    },
    Some("""WITH g AS (
           |  SELECT o_custkey,
           |    datediff('day',
           |      lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
           |        ORDER BY o_orderdate, o_orderkey),
           |      o_orderdate)::BIGINT AS gap
           |  FROM orders),
           |j AS (
           |  SELECT c_mktsegment, gap FROM g
           |  JOIN customer ON o_custkey = c_custkey
           |  WHERE gap IS NOT NULL)
           |SELECT c_mktsegment, count(*)::BIGINT AS n_gaps,
           |  round(avg(gap), 4) AS mean_gap,
           |  round(quantile_cont(gap, 0.5), 4) AS median_gap,
           |  round(quantile_cont(gap, 0.9), 4) AS p90_gap
           |FROM j GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin))

  val all: Seq[Q] = Seq(q246, q247, q248, q249, q250)
}
