package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch V (X141+):
  * periodogram seasonality probe, functional-dependency audit battery,
  * MMR diversity re-ranking (greedy unrolled in the oracle), trimmed
  * mean, and a pairwise correlation matrix from one aggregate.
  */
object CatalogSignal {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X141: periodogram power at candidate periods 7/14/30
    * ([[graft.events.Spectral.periodogram]]) over each event type's
    * daily count series — the "which season length is real" probe. */
  private val q251 = Q("q251_periodogram",
    (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .filter($"ts".isNotNull) // null-instant complete-case (fuzz-37)
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).cast("double").as("c"))
      graft.events.Spectral.periodogram(daily, "event_type", "d", "c",
          Seq(7, 14, 30))
        .orderBy($"event_type", $"period")
    },
    Some("""WITH daily AS (
           |  SELECT event_type, ts::DATE AS d, count(*)::DOUBLE AS c
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |ix AS (
           |  SELECT event_type, c,
           |    (row_number() OVER (PARTITION BY event_type ORDER BY d)
           |      - 1)::DOUBLE AS t,
           |    avg(c) OVER (PARTITION BY event_type) AS m
           |  FROM daily),
           |p AS (SELECT unnest([7, 14, 30]) AS period),
           |a AS (
           |  SELECT event_type, period, count(*)::BIGINT AS n,
           |    sum((c - m) * cos(2.0 * pi() * t / period)) AS aa,
           |    sum((c - m) * sin(2.0 * pi() * t / period)) AS bb,
           |    sum(cos(2.0 * pi() * t / period)
           |        * cos(2.0 * pi() * t / period)) AS cc,
           |    sum(sin(2.0 * pi() * t / period)
           |        * sin(2.0 * pi() * t / period)) AS sn,
           |    sum((c - m) * (c - m)) AS ss
           |  FROM ix, p GROUP BY 1, 2)
           |SELECT event_type, period, n,
           |  round((aa * aa + bb * bb) * 2.0 / n, 4) AS power,
           |  round((CASE WHEN cc > 0 THEN aa * aa / cc ELSE 0.0 END
           |         + CASE WHEN sn > 0 THEN bb * bb / sn ELSE 0.0 END)
           |    / nullif(ss, 0), 4) AS power_share
           |FROM a ORDER BY event_type, period""".stripMargin))

  /** X142: functional-dependency audit battery
    * ([[graft.util.Profile.fdCheck]]) — one row per candidate FD with
    * violating-key/row counts (partkey→brand holds; brand→type and
    * nation→segment don't). */
  private val q252 = Q("q252_fd_check",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
      val cust = t(s, dir, "customer")
      def one(name: String, df: DataFrame, l: String, r: String) =
        graft.util.Profile.fdCheck(df, l, r)
          .select(lit(name).as("fd"), $"n_keys", $"n_violating_keys",
            $"n_violating_rows", $"holds")
      one("partkey->brand", li, "l_partkey", "p_brand")
        .union(one("brand->type", li, "p_brand", "p_type"))
        .union(one("custkey->segment", cust, "c_custkey", "c_mktsegment"))
        .union(one("nation->segment", cust, "c_nationkey", "c_mktsegment"))
        .orderBy($"fd")
    },
    Some("""WITH j AS (
           |  SELECT l_partkey, p_brand, p_type
           |  FROM lineitem JOIN part ON l_partkey = p_partkey),
           |fd1 AS (
           |  SELECT 'partkey->brand' AS fd, l AS lv, r AS rv, n FROM (
           |    SELECT l_partkey AS l, p_brand AS r, count(*)::BIGINT AS n
           |    FROM j WHERE l_partkey IS NOT NULL AND p_brand IS NOT NULL
           |    GROUP BY 1, 2)),
           |fd2 AS (
           |  SELECT 'brand->type' AS fd, l AS lv, r AS rv, n FROM (
           |    SELECT p_brand AS l, p_type AS r, count(*)::BIGINT AS n
           |    FROM j WHERE p_brand IS NOT NULL AND p_type IS NOT NULL
           |    GROUP BY 1, 2)),
           |fd3 AS (
           |  SELECT 'custkey->segment' AS fd, l AS lv, r AS rv, n FROM (
           |    SELECT CAST(c_custkey AS VARCHAR) AS l, c_mktsegment AS r,
           |      count(*)::BIGINT AS n
           |    FROM customer
           |    WHERE c_custkey IS NOT NULL AND c_mktsegment IS NOT NULL
           |    GROUP BY 1, 2)),
           |fd4 AS (
           |  SELECT 'nation->segment' AS fd, l AS lv, r AS rv, n FROM (
           |    SELECT CAST(c_nationkey AS VARCHAR) AS l, c_mktsegment AS r,
           |      count(*)::BIGINT AS n
           |    FROM customer
           |    WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
           |    GROUP BY 1, 2)),
           |allfd AS (
           |  SELECT fd, CAST(lv AS VARCHAR) AS lv, rv, n FROM fd1
           |  UNION ALL SELECT fd, CAST(lv AS VARCHAR), rv, n FROM fd2
           |  UNION ALL SELECT fd, lv, rv, n FROM fd3
           |  UNION ALL SELECT fd, lv, rv, n FROM fd4),
           |keys AS (
           |  SELECT fd, lv, count(*)::BIGINT AS nrhs,
           |    sum(n)::BIGINT AS rws, max(n)::BIGINT AS maj
           |  FROM allfd GROUP BY 1, 2)
           |SELECT fd, count(*)::BIGINT AS n_keys,
           |  sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END)::BIGINT
           |    AS n_violating_keys,
           |  sum(CASE WHEN nrhs > 1 THEN rws - maj ELSE 0 END)::BIGINT
           |    AS n_violating_rows,
           |  sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM keys GROUP BY fd ORDER BY fd""".stripMargin))

  /** X143: MMR diversity re-ranking
    * ([[graft.ann.Similarity.mmrSelect]], λ = 0.7, k = 5) over the
    * top-30 cosine candidates for query vector 0 — the oracle unrolls
    * the greedy selection into five explicit stages with the same
    * runtime-double (1.0 − 0.7) weight and 6dp pre-rounded
    * comparison scores. */
  private val q253 = Q("q253_mmr",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val cand = graft.ann.Similarity.bruteForceTopK(emb,
          emb.filter($"vec_id" === 0), "vec_id", "embedding", k = 30)
        .join(emb.withColumnRenamed("vec_id", "neighbor_id"),
          Seq("neighbor_id"))
        .select($"neighbor_id".as("vec_id"), $"embedding",
          $"cos_sim".as("rel"))
      graft.ann.Similarity.mmrSelect(cand, "vec_id", "embedding",
          "rel", k = 5, lambda = 0.7)
        .select($"rank", $"id".as("vec_id"), $"relevance", $"mmr_score")
        .orderBy($"rank")
    },
    Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
           |           FROM embeddings),
           |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
           |sc AS (SELECT vec_id, e,
           |         round(list_cosine_similarity(e, qe), 6) AS rel
           |       FROM v, q WHERE vec_id != 0),
           |cand AS (SELECT vec_id, e, rel FROM sc
           |         ORDER BY rel DESC, vec_id LIMIT 30),
           |s1 AS (SELECT vec_id, rel, round(0.7 * rel, 6) AS mmr, e
           |       FROM cand ORDER BY mmr DESC, vec_id LIMIT 1),
           |r2 AS (SELECT c.vec_id, c.rel, c.e,
           |    round(0.7 * c.rel - (1.0 - 0.7) * (SELECT
           |      max(round(list_cosine_similarity(c.e, s.e), 6))
           |      FROM s1 s), 6) AS mmr
           |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)),
           |s2 AS (SELECT * FROM r2 ORDER BY mmr DESC, vec_id LIMIT 1),
           |sel2 AS (SELECT vec_id, e FROM s1
           |         UNION ALL SELECT vec_id, e FROM s2),
           |r3 AS (SELECT c.vec_id, c.rel, c.e,
           |    round(0.7 * c.rel - (1.0 - 0.7) * (SELECT
           |      max(round(list_cosine_similarity(c.e, s.e), 6))
           |      FROM sel2 s), 6) AS mmr
           |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)),
           |s3 AS (SELECT * FROM r3 ORDER BY mmr DESC, vec_id LIMIT 1),
           |sel3 AS (SELECT vec_id, e FROM sel2
           |         UNION ALL SELECT vec_id, e FROM s3),
           |r4 AS (SELECT c.vec_id, c.rel, c.e,
           |    round(0.7 * c.rel - (1.0 - 0.7) * (SELECT
           |      max(round(list_cosine_similarity(c.e, s.e), 6))
           |      FROM sel3 s), 6) AS mmr
           |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)),
           |s4 AS (SELECT * FROM r4 ORDER BY mmr DESC, vec_id LIMIT 1),
           |sel4 AS (SELECT vec_id, e FROM sel3
           |         UNION ALL SELECT vec_id, e FROM s4),
           |r5 AS (SELECT c.vec_id, c.rel, c.e,
           |    round(0.7 * c.rel - (1.0 - 0.7) * (SELECT
           |      max(round(list_cosine_similarity(c.e, s.e), 6))
           |      FROM sel4 s), 6) AS mmr
           |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)),
           |s5 AS (SELECT * FROM r5 ORDER BY mmr DESC, vec_id LIMIT 1)
           |SELECT 1::BIGINT AS rank, vec_id, rel AS relevance,
           |       mmr AS mmr_score FROM s1
           |UNION ALL SELECT 2, vec_id, rel, mmr FROM s2
           |UNION ALL SELECT 3, vec_id, rel, mmr FROM s3
           |UNION ALL SELECT 4, vec_id, rel, mmr FROM s4
           |UNION ALL SELECT 5, vec_id, rel, mmr FROM s5
           |ORDER BY rank""".stripMargin))

  /** X144: trimmed mean ([[graft.de.RobustStats.trimmedMean]],
    * 10–90% band) of account balances per segment. */
  private val q254 = Q("q254_trimmed_mean",
    (s, dir) => {
      import s.implicits._
      graft.de.RobustStats.trimmedMean(t(s, dir, "customer"),
          "c_mktsegment", "c_acctbal", pLo = 0.1, pHi = 0.9)
        .orderBy($"c_mktsegment")
    },
    Some("""WITH cuts AS (
           |  SELECT c_mktsegment AS g,
           |    quantile_cont(c_acctbal, 0.1) AS lo,
           |    quantile_cont(c_acctbal, 0.9) AS hi,
           |    count(*)::BIGINT AS n
           |  FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1)
           |SELECT c.c_mktsegment, max(cuts.n)::BIGINT AS n,
           |  sum(CASE WHEN c_acctbal >= lo AND c_acctbal <= hi
           |      THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           |  round(max(lo), 4) AS p_lo, round(max(hi), 4) AS p_hi,
           |  round(avg(CASE WHEN c_acctbal >= lo AND c_acctbal <= hi
           |            THEN c_acctbal END), 4) AS trimmed_mean
           |FROM customer c JOIN cuts ON c.c_mktsegment = cuts.g
           |WHERE c_acctbal IS NOT NULL
           |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin))

  /** X145: pairwise correlation matrix of the four lineitem measures
    * from ONE aggregate of sufficient statistics (the ols2/partialCorr
    * kernel widened to 6 pairs) — no per-pair passes. */
  private val q255 = Q("q255_corr_matrix",
    (s, dir) => {
      import s.implicits._
      val a = t(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        sum($"l_quantity").as("sq"), sum($"l_extendedprice").as("sp"),
        sum($"l_discount").as("sd"), sum($"l_tax").as("st"),
        sum($"l_quantity" * $"l_quantity").as("sqq"),
        sum($"l_extendedprice" * $"l_extendedprice").as("spp"),
        sum($"l_discount" * $"l_discount").as("sdd"),
        sum($"l_tax" * $"l_tax").as("stt"),
        sum($"l_quantity" * $"l_extendedprice").as("sqp"),
        sum($"l_quantity" * $"l_discount").as("sqd"),
        sum($"l_quantity" * $"l_tax").as("sqt"),
        sum($"l_extendedprice" * $"l_discount").as("spd"),
        sum($"l_extendedprice" * $"l_tax").as("spt"),
        sum($"l_discount" * $"l_tax").as("sdt"))
      val n = $"n".cast("double")
      def c(sab: String, sa: String, sb: String) =
        col(sab) - col(sa) * col(sb) / n
      def r(sab: String, sa: String, sb: String,
            saa: String, sbb: String) =
        round(c(sab, sa, sb) /
          nullif(sqrt(c(saa, sa, sa) * c(sbb, sb, sb)), lit(0.0)), 4)
      a.select($"n",
        r("sqp", "sq", "sp", "sqq", "spp").as("r_qty_price"),
        r("sqd", "sq", "sd", "sqq", "sdd").as("r_qty_disc"),
        r("sqt", "sq", "st", "sqq", "stt").as("r_qty_tax"),
        r("spd", "sp", "sd", "spp", "sdd").as("r_price_disc"),
        r("spt", "sp", "st", "spp", "stt").as("r_price_tax"),
        r("sdt", "sd", "st", "sdd", "stt").as("r_disc_tax"))
    },
    Some("""WITH a AS (
           |  SELECT count(*)::BIGINT AS n,
           |    sum(l_quantity) AS sq, sum(l_extendedprice) AS sp,
           |    sum(l_discount) AS sd, sum(l_tax) AS st,
           |    sum(l_quantity * l_quantity) AS sqq,
           |    sum(l_extendedprice * l_extendedprice) AS spp,
           |    sum(l_discount * l_discount) AS sdd,
           |    sum(l_tax * l_tax) AS stt,
           |    sum(l_quantity * l_extendedprice) AS sqp,
           |    sum(l_quantity * l_discount) AS sqd,
           |    sum(l_quantity * l_tax) AS sqt,
           |    sum(l_extendedprice * l_discount) AS spd,
           |    sum(l_extendedprice * l_tax) AS spt,
           |    sum(l_discount * l_tax) AS sdt
           |  FROM lineitem)
           |SELECT n,
           |  round((sqp - sq * sp / n)
           |    / nullif(sqrt((sqq - sq * sq / n) * (spp - sp * sp / n)), 0), 4)
           |    AS r_qty_price,
           |  round((sqd - sq * sd / n)
           |    / nullif(sqrt((sqq - sq * sq / n) * (sdd - sd * sd / n)), 0), 4)
           |    AS r_qty_disc,
           |  round((sqt - sq * st / n)
           |    / nullif(sqrt((sqq - sq * sq / n) * (stt - st * st / n)), 0), 4)
           |    AS r_qty_tax,
           |  round((spd - sp * sd / n)
           |    / nullif(sqrt((spp - sp * sp / n) * (sdd - sd * sd / n)), 0), 4)
           |    AS r_price_disc,
           |  round((spt - sp * st / n)
           |    / nullif(sqrt((spp - sp * sp / n) * (stt - st * st / n)), 0), 4)
           |    AS r_price_tax,
           |  round((sdt - sd * st / n)
           |    / nullif(sqrt((sdd - sd * sd / n) * (stt - st * st / n)), 0), 4)
           |    AS r_disc_tax
           |FROM a""".stripMargin))

  val all: Seq[Q] = Seq(q251, q252, q253, q254, q255)
}
