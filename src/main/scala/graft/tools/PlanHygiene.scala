package graft.tools

import org.apache.spark.scheduler.SparkListenerJobStart
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Physical-plan hygiene detectors shared by the CatalogInventory tool
  * and CatalogPlanAuditSpec: the three shapes that are fine on a 60k-row
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
  *
  * Detection walks the pre-AQE physical plan INCLUDING subquery plans,
  * so a cartesian hiding inside a scalar subquery is still caught.
  */
object PlanHygiene {

  /** Violation kinds found in `df`'s physical plan (deduplicated). */
  def violations(df: DataFrame): Seq[String] =
    kinds(df.queryExecution.sparkPlan)

  def kinds(plan: SparkPlan): Seq[String] =
    plan.collectWithSubqueries {
      case _: CartesianProductExec => "cartesian"
      case _: BroadcastNestedLoopJoinExec => "nested-loop-join"
      case w: WindowExec if w.partitionSpec.isEmpty =>
        "unpartitioned-window"
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        "unpartitioned-window"
    }.distinct

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
