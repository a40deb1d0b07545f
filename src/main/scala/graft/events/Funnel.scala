package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how many entities progress through a stage
  * sequence (signup → click → purchase), where stage i counts only if it
  * happens strictly AFTER the entity reached stage i−1 — the product
  * question "where do users drop off", which a per-stage count without
  * the ordering constraint silently overstates (a purchase BEFORE the
  * signup is not a conversion).
  *
  * Reach time of stage i = MIN event time among the entity's stage-i
  * events later than its stage-(i−1) reach time (min-first semantics —
  * deterministic, engine-independent).
  *
  * Scale shape: one chained aggregate per stage — stage i filters the
  * event stream to its type (predicate pushes to the scan), joins the
  * per-entity reach table so far (entity-cardinality, co-partitioned on
  * the entity key — every stage reuses the same partitioning, and AQE
  * broadcasts the reach side when small), and hash-aggregates min(ts).
  * The event stream is scanned once per stage but never self-joined
  * all-pairs; shuffle volume per stage ∝ entities that reached the
  * previous stage, monotonically shrinking down the funnel.
  */
object Funnel {

  /** Per-entity reach times: (entity, __t0 … __t{n-1}), null once the
    * funnel is abandoned. Every entity that reached stage 0 has a row. */
  def stageTimes(events: DataFrame, entityCol: String, typeCol: String,
                 tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    val reserved = stages.indices.map(i => s"__t$i")
    require(!events.columns.exists(reserved.contains),
      s"events must not contain ${reserved.mkString("/")} columns")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("__t0"))
    stages.zipWithIndex.tail.foldLeft(first) { case (reach, (stage, i)) =>
      val cur = events.filter(col(typeCol) === stage)
        .join(reach.select(col(entityCol), col(s"__t${i - 1}")), Seq(entityCol))
        .filter(col(tsCol) > col(s"__t${i - 1}"))   // null prev -> no rows
        .groupBy(col(entityCol)).agg(min(col(tsCol)).as(s"__t$i"))
      reach.join(cur, Seq(entityCol), "left_outer")
    }
  }

  /** Per-transition conversion latency: for each consecutive stage pair
    * (i−1 → i), how long converting entities took — count, median, mean,
    * and max seconds (exact median; the same L22 trade as every exact
    * quantile here). The product question after funnelCounts says WHERE
    * users drop: "how long do the ones who convert take" decides
    * attribution windows and nudge timing. One aggregate over the
    * entity-cardinality reach table — the events are not rescanned.
    * Output: (stage_idx of the DESTINATION stage, stage, n_converted,
    * median_sec, avg_sec, max_sec — 4 dp), stages with no conversions
    * emit n_converted = 0 with null latencies. */
  def conversionLatency(events: DataFrame, entityCol: String,
                        typeCol: String, tsCol: String,
                        stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "need at least two stages for latencies")
    val reach = stageTimes(events, entityCol, typeCol, tsCol, stages)
    // ALL transitions aggregate in ONE pass over the reach table (a
    // union of per-transition reach.agg branches would embed the whole
    // chained stageTimes plan once per transition and re-execute it),
    // then the single row explodes into per-transition rows — the
    // funnelCounts pattern.
    def dt(i: Int) = (unix_micros(col(s"__t$i")) -
      unix_micros(col(s"__t${i - 1}"))).cast("double") / 1e6
    val aggs = stages.indices.tail.flatMap { i =>
      Seq(count(col(s"__t$i")).as(s"__c$i"),
        round(median(dt(i)), 4).as(s"__med$i"),
        round(avg(dt(i)), 4).as(s"__avg$i"),
        round(max(dt(i)), 4).as(s"__max$i"))
    }
    val one = reach.agg(aggs.head, aggs.tail: _*)
    val rows = stages.indices.tail.map { i =>
      struct(lit(i + 1).as("stage_idx"), lit(stages(i)).as("stage"),
        col(s"__c$i").as("n_converted"), col(s"__med$i").as("median_sec"),
        col(s"__avg$i").as("avg_sec"), col(s"__max$i").as("max_sec"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
      .orderBy(col("stage_idx"))
  }

  /** Funnel conversion table: (stage_idx 1-based, stage, n_entities
    * reaching it, conversion_from_first rounded to 4 dp). One
    * entity-keyed aggregate chain + one single-row count aggregate. */
  def funnelCounts(events: DataFrame, entityCol: String, typeCol: String,
                   tsCol: String, stages: Seq[String]): DataFrame = {
    val reach = stageTimes(events, entityCol, typeCol, tsCol, stages)
    val counts = reach.agg(
      count(col("__t0")).as("c0"),
      stages.indices.tail.map(i => count(col(s"__t$i")).as(s"c$i")): _*)
    val rows = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
        col(s"c$i").as("n_entities"),
        round(col(s"c$i").cast("double") / nullif(col("c0"), lit(0L)), 4)
          .as("conversion"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
