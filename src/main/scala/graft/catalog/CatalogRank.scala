package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog.Q
import graft.util.Tables

/** Oracle-checked catalog entries, round-7 batch Z (X157+): graded
  * ranking evaluation (nDCG@k / MRR / P@k) and deterministic negative
  * sampling for contrastive training.
  */
object CatalogRank {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Mask = (1L << 47) - 1

  /** X157: nDCG@10 / MRR / precision@10 per query
    * ([[graft.ml.Ranking.ndcgAtK]]) — queries are brands, docs their
    * parts, graded relevance p_size mod 4, scores the md5-uniform
    * 60/40 relevance blend snapped to a 3dp grid (the CatalogEcon8
    * construction; both engines build identical scores). */
  private val q266 = Q("q266_ndcg",
    (s, dir) => {
      import s.implicits._
      import graft.functions.gfunctions.md5_long
      val scored = t(s, dir, "part").select($"p_brand", $"p_partkey",
        ($"p_size" % 4).cast("double").as("rel"),
        round((md5_long($"p_partkey".cast("string"))
          .bitwiseAND(lit(Mask)).cast("double") / Mask) * 0.5 +
          ($"p_size" % 4) * 0.1, 3).as("score"))
      graft.ml.Ranking.ndcgAtK(scored, "p_brand", "p_partkey",
          "rel", "score", k = 10, relThreshold = 2.0)
        .orderBy($"p_brand")
    },
    Some("""WITH sc AS (
           |  SELECT p_brand, p_partkey,
           |    (p_size % 4)::DOUBLE AS rel,
           |    round(((md5_number_lower(CAST(p_partkey AS VARCHAR))
           |            & 140737488355327)::DOUBLE / 140737488355327)
           |          * 0.5 + (p_size % 4) * 0.1, 3) AS score
           |  FROM part),
           |r AS (
           |  SELECT p_brand, rel,
           |    row_number() OVER (PARTITION BY p_brand
           |      ORDER BY score DESC, p_partkey) AS pos,
           |    row_number() OVER (PARTITION BY p_brand
           |      ORDER BY rel DESC, p_partkey) AS ipos
           |  FROM sc),
           |a AS (
           |  SELECT p_brand, count(*)::BIGINT AS n_docs,
           |    sum(CASE WHEN pos <= 10
           |        THEN (pow(2.0, rel) - 1) / log2(pos + 1) END) AS dcg,
           |    sum(CASE WHEN ipos <= 10
           |        THEN (pow(2.0, rel) - 1) / log2(ipos + 1) END) AS idcg,
           |    min(CASE WHEN rel >= 2.0 THEN pos END) AS fp,
           |    sum(CASE WHEN pos <= 10 AND rel >= 2.0
           |        THEN 1 ELSE 0 END)::BIGINT AS hits
           |  FROM r GROUP BY 1)
           |SELECT p_brand, n_docs, round(dcg, 6) AS dcg,
           |  round(idcg, 6) AS idcg,
           |  round(dcg / nullif(idcg, 0), 6) AS ndcg,
           |  round(1.0 / fp, 6) AS mrr,
           |  round(hits::DOUBLE / 10, 4) AS p_at_k
           |FROM a ORDER BY p_brand""".stripMargin))

  /** X158: deterministic negative sampling
    * ([[graft.sample.Sampling.negativeSample]], k = 3) — per customer,
    * the three salted-md5-top brands they never purchased; the oracle
    * replays the signed-hash ordering (the q33 signed-reinterpretation
    * discipline). */
  private val q267 = Q("q267_negative_sampling",
    (s, dir) => {
      import s.implicits._
      val pos = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .select($"o_custkey", $"p_brand").distinct()
      // a null brand is not an item: it cannot be named as a negative,
      // and its null salted hash sorts engine-dependently (fuzz-23)
      val items = t(s, dir, "part").select($"p_brand")
        .filter($"p_brand".isNotNull).distinct()
      graft.sample.Sampling.negativeSample(pos, "o_custkey", "p_brand",
          items, k = 3, salt = "neg1")
        .orderBy($"o_custkey", $"neg_rank")
    },
    Some("""WITH pos AS (
           |  SELECT DISTINCT o_custkey, p_brand
           |  FROM orders
           |  JOIN lineitem ON o_orderkey = l_orderkey
           |  JOIN part ON l_partkey = p_partkey),
           |ents AS (SELECT DISTINCT o_custkey FROM pos),
           |items AS (SELECT DISTINCT p_brand FROM part
           |          WHERE p_brand IS NOT NULL),
           |neg AS (
           |  SELECT e.o_custkey, i.p_brand
           |  FROM ents e CROSS JOIN items i
           |  WHERE NOT EXISTS (SELECT 1 FROM pos p
           |    WHERE p.o_custkey = e.o_custkey
           |      AND p.p_brand = i.p_brand)),
           |h AS (
           |  SELECT o_custkey, p_brand,
           |    md5_number_lower('neg1:' || CAST(o_custkey AS VARCHAR)
           |      || ':' || p_brand) AS hu
           |  FROM neg),
           |r AS (
           |  SELECT o_custkey, p_brand,
           |    row_number() OVER (PARTITION BY o_custkey
           |      ORDER BY (hu::HUGEINT
           |        - CASE WHEN hu >= 9223372036854775808::HUGEINT
           |               THEN 18446744073709551616::HUGEINT
           |               ELSE 0::HUGEINT END),
           |        p_brand) AS neg_rank
           |  FROM h)
           |SELECT o_custkey, p_brand, neg_rank::BIGINT AS neg_rank
           |FROM r WHERE neg_rank <= 3
           |ORDER BY o_custkey, neg_rank""".stripMargin))

  val all: Seq[Q] = Seq(q266, q267)
}
