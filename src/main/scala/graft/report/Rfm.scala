package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Ranks

/** RFM (recency / frequency / monetary) customer scoring — the
  * classical segmentation: each customer is ranked on how recently they
  * last ordered, how often, and how much they spent, and each rank is
  * cut into quintiles 5 (best) … 1 (worst).
  *
  * Determinism: quintiles come from `score = 5 − floor((rank−1)·5/n)`
  * on a TOTAL-order global rank with the entity key as tie break — no
  * ntile ambiguity, and the floor is exact in double while 5n < 2^52
  * (the numerator is an exact integer, so the quotient can only round
  * across an integer boundary when 5n approaches 1/ulp). Facts collapse to one row per customer BEFORE any ranking,
  * so the three rank passes run at entity grain; each uses
  * [[Ranks.globalRowNumber]], which size-dispatches from a plain
  * window to the distributed two-pass rank above 2M entities —
  * a billion-customer table never sees a single-partition sort.
  *
  * The recency anchor is max(ts) over the input (broadcast 1-row
  * crossJoin, the A14 pattern), so the operator is reproducible from
  * its input alone — no wall-clock dependence.
  */
object Rfm {

  /** Per-entity RFM scores: (key, recency_days, frequency, monetary,
    * r_score, f_score, m_score). `monetary` is rounded to 2 dp (money).
    * Ranks: recency_days ASC (most recent = score 5), frequency DESC,
    * monetary DESC, each tie-broken by key ASC.
    *
    * Complete-case on the recency axis: an entity whose every order
    * has a null timestamp has no observable recency and is DROPPED
    * (before n, so quintile cuts see only scoreable entities) — the
    * null-instant contract. Ranking it instead would put it at
    * engine-dependent ends of the recency sort (Spark asc = nulls
    * first = score 5, DuckDB nulls last = score 1 — fuzz-48's Zipf
    * remap concentrated null dates into such entities). A null
    * MONETARY (dates fine, all amounts null) stays: desc sorts rank
    * nulls last on both engines. */
  def scores(orders: DataFrame, key: String, ts: String,
             amount: String,
             distributedThreshold: Long = graft.util.Dispatch.threshold(2000000L)): DataFrame = {
    val perEntity = orders.groupBy(col(key))
      .agg(max(to_date(col(ts))).as("__last"),
        count(lit(1)).as("frequency"),
        round(sum(col(amount)), 2).as("monetary"))
      .filter(col("__last").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = perEntity.count()
    val anchor = perEntity.agg(max(col("__last")).as("__asof"))
    val base = perEntity.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("__asof"), col("__last")).cast("long"))
      .drop("__last", "__asof")
    def quint(rankCol: String): org.apache.spark.sql.Column =
      (lit(5) - floor((col(rankCol) - 1) * lit(5.0) / lit(n.toDouble)))
        .cast("int")
    val ranked = Seq(
      ("__rr", Seq(col("recency_days").asc, col(key).asc), "r_score"),
      ("__rf", Seq(col("frequency").desc, col(key).asc), "f_score"),
      ("__rm", Seq(col("monetary").desc, col(key).asc), "m_score"))
      .foldLeft(base) { case (df, (rk, sort, score)) =>
        Ranks.globalRowNumber(df, sort, rk, n, distributedThreshold)
          .withColumn(score, quint(rk)).drop(rk)
      }
    perEntity.unpersist(false)
    ranked
  }

  /** Segment rollup of [[scores]]: per (r_score, f_score, m_score)
    * cell, customer count and mean monetary (4-dp) — at most 125 rows
    * regardless of input size. */
  def segments(orders: DataFrame, key: String, ts: String,
               amount: String,
               distributedThreshold: Long = graft.util.Dispatch.threshold(2000000L)): DataFrame =
    scores(orders, key, ts, amount, distributedThreshold)
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        // segment average in exact integer cents, emitted as the raw
        // quotient with no final round (fuzz-39, the q94/q118
        // apparent-midpoint class: an avg of 2-dp monetary values over
        // a small segment straddles the 4-dp round on engine ulps)
        (sum(round(col("monetary") * 100).cast("long")).cast("double")
          / count(lit(1)) / 100).as("avg_monetary"))
}
