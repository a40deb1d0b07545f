package graft.tools

import org.apache.spark.scheduler.SparkListenerJobStart
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CoalesceExec, FileSourceScanExec, GlobalLimitExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Physical-plan hygiene detectors shared by the CatalogInventory tool
  * and CatalogPlanAuditSpec: the five shapes that are fine on a 60k-row
  * test table and fatal on a 1000-executor cluster —
  *
  *  - `cartesian`: CartesianProductExec — O(|L|·|R|) rows moved.
  *  - `nested-loop-join`: BroadcastNestedLoopJoinExec — every probe row
  *    scans the whole broadcast side; legitimate ONLY when one side is
  *    literal-bounded (a 1-row parameter frame, a tiny generated grid).
  *  - `unpartitioned-window`: WindowExec/WindowGroupLimitExec with an
  *    empty partitionSpec — the whole input sorts through ONE task;
  *    legitimate ONLY over a bounded aggregate domain (vocab, buckets,
  *    distinct durations) with a documented contract or size dispatch.
  *  - `single-partition-exchange`: a ShuffleExchangeExec targeting
  *    SinglePartition (or CoalesceExec(1)) — the `repartition(1)` /
  *    `coalesce(1)` shape that funnels the whole input through one
  *    task. The three bounded forms Spark itself plans are EXEMPT:
  *    the final stage of a groupingless aggregate (input = one partial
  *    row per partition), the sort feeding an unpartitioned window
  *    (already reported as `unpartitioned-window` — one finding per
  *    cause), and a global `limit(k)` (output bounded by k).
  *  - `unpushed-scan-filter`: a FileSourceScanExec that carries
  *    post-scan `dataFilters` but pushed NOTHING to the source
  *    (PushedFilters: []) — the shape a future expression wrapper
  *    would silently produce catalog-wide, turning every selective
  *    scan into a full-table read. Spark pushes at least the IsNotNull
  *    guards of any column predicate, so an empty pushdown under a
  *    non-empty filter set means translation failed entirely.
  *
  * Detection walks the pre-AQE physical plan INCLUDING subquery plans,
  * so a cartesian hiding inside a scalar subquery is still caught.
  */
object PlanHygiene {

  /** Violation kinds found in `df`'s physical plan (deduplicated). */
  def violations(df: DataFrame): Seq[String] =
    kinds(df.queryExecution.sparkPlan)

  def kinds(plan: SparkPlan): Seq[String] = {
    val roots = plan +: plan.subqueriesAll
    val contextFree = roots.flatMap(_.collect {
      case _: CartesianProductExec => "cartesian"
      case _: BroadcastNestedLoopJoinExec => "nested-loop-join"
      case w: WindowExec if w.partitionSpec.isEmpty =>
        "unpartitioned-window"
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        "unpartitioned-window"
      case s: FileSourceScanExec
        if s.dataFilters.nonEmpty &&
          s.metadata.get("PushedFilters").contains("[]") =>
        "unpushed-scan-filter"
    })
    (contextFree ++ roots.flatMap(singlePartitionExchanges)).distinct
  }

  /** Contextual walk for the single-partition-exchange detector: an
    * exchange to SinglePartition (or coalesce-to-1) fires unless its
    * consumer is one of the bounded shapes (groupingless final
    * aggregate, unpartitioned-window sort, global limit). */
  private def singlePartitionExchanges(root: SparkPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    def walk(n: SparkPlan, exempt: Boolean): Unit = n match {
      case agg: BaseAggregateExec if agg.groupingExpressions.isEmpty =>
        agg.children.foreach(walk(_, exempt = true))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        w.children.foreach(walk(_, exempt = true))
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        w.children.foreach(walk(_, exempt = true))
      case l: GlobalLimitExec =>
        l.children.foreach(walk(_, exempt = true))
      case s: SortExec => // transparent: sort between consumer and exchange
        s.children.foreach(walk(_, exempt))
      case e: ShuffleExchangeExec =>
        if (!exempt && e.outputPartitioning == SinglePartition)
          out += "single-partition-exchange"
        e.children.foreach(walk(_, exempt = false))
      case c: CoalesceExec =>
        if (!exempt && c.numPartitions == 1)
          out += "single-partition-exchange"
        c.children.foreach(walk(_, exempt = false))
      case other =>
        other.children.foreach(walk(_, exempt = false))
    }
    walk(root, exempt = false)
    out.result()
  }

  /** True for the metadata jobs Spark runs on EVERY
    * `spark.read.parquet` (footer/schema reads: a bare
    * parallelize+mapPartitions with no SQL execution id) — the
    * eager/lazy classification must not count these as "construction
    * ran work", or every query would classify eager. Real work always
    * carries a SQL execution id (Dataset actions) or scans/shuffles
    * data (FileScanRDD, ShuffledRowRDD, … in some stage). */
  def isMetadataJob(js: SparkListenerJobStart): Boolean =
    js.properties.getProperty("spark.sql.execution.id") == null &&
      js.stageInfos.forall(_.rddInfos.forall(r =>
        r.name == "ParallelCollectionRDD" || r.name == "MapPartitionsRDD"))
}
