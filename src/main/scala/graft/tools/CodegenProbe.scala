package graft.tools

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hypothesis probe for the fixed-iteration drivers (opt round r15,
  * guide §1 "measure first"): is the per-step cost of a Newton/IRLS
  * step on a cached frame dominated by Janino re-compilation caused
  * by fresh `lit(beta)` constants in the generated source?
  *
  * Runs the same 9-sum weighted aggregate (the newtonLogistic /
  * olsBeta shape) for N steps over a cached frame two ways:
  *   A) step coefficients as `lit(...)` (the pre-r15 pattern);
  *   B) step coefficients via util.Param.scalar (non-foldable
  *      parameter constants riding the codegen references array).
  * Prints per-step wall clock plus the delta of the JVM-wide codegen
  * compilation counter (CodegenMetrics.METRIC_COMPILATION_TIME.count)
  * so a cache miss is directly visible per step.
  *
  * Usage: CodegenProbe [steps]    (env: SPARK_GRAFT_SF_DIR, _CPUS)
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val steps = if (args.nonEmpty) args(0).toInt else 12
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_extendedprice").cast("double").as("__y"),
        col("l_quantity").cast("double").as("__x1"),
        col("l_discount").cast("double").as("__x2"))
      .persist()
    d.count()

    def agg(eta: org.apache.spark.sql.Column,
            src: org.apache.spark.sql.DataFrame): Unit = {
      val mu = lit(1.0) / (lit(1.0) + exp(-eta))
      val w = mu * (lit(1.0) - mu)
      src.agg(
        sum(w).as("a"), sum(w * col("__x1")).as("b"),
        sum(w * col("__x2")).as("c"),
        sum(w * col("__x1") * col("__x1")).as("dd"),
        sum(w * col("__x1") * col("__x2")).as("e"),
        sum(w * col("__x2") * col("__x2")).as("f"),
        sum(col("__y") - mu).as("g1"),
        sum((col("__y") - mu) * col("__x1")).as("g2"),
        sum((col("__y") - mu) * col("__x2")).as("g3")).head()
    }

    def run(tag: String)(step: Int => Unit): Unit = {
      println(s"== $tag ==")
      (1 to steps).foreach { i =>
        val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
        val t0 = System.nanoTime()
        step(i)
        val dt = (System.nanoTime() - t0) / 1e6
        val dc = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - c0
        println(f"$tag step $i%2d: $dt%8.1f ms, codegen compiles: $dc")
      }
    }

    // interleave-resistant order: B first then A then B again would
    // conflate JIT warmup; run A, B, A2, B2 so each shape gets a
    // warmed repetition and the steady-state per-step cost is the
    // 2nd block's steps 2+.
    def betas(i: Int) = Array(0.01 * i, 0.002 * i, -0.003 * i)
    def litStep(i: Int): Unit = {
      val b = betas(i)
      agg(lit(b(0)) + lit(b(1)) * col("__x1") + lit(b(2)) * col("__x2"), d)
    }
    def paramStep(i: Int): Unit = {
      val b = betas(i)
      import graft.util.Param.scalar
      agg(scalar(b(0)) + scalar(b(1)) * col("__x1") +
        scalar(b(2)) * col("__x2"), d)
    }
    // dump mode: write the two param-step generated sources to /tmp
    // and report whether they are byte-identical (the cache-hit
    // precondition), instead of timing.
    if (args.contains("dump")) {
      // AQE wraps the plan and hides codegen subtrees from the debug
      // helper; the source-identity question is the same without it
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def src(i: Int): String = {
        val b = betas(i)
        import graft.util.Param.scalar
        val eta = scalar(b(0)) + scalar(b(1)) * col("__x1") +
          scalar(b(2)) * col("__x2")
        val mu = lit(1.0) / (lit(1.0) + exp(-eta))
        val w = mu * (lit(1.0) - mu)
        val q = d.agg(
          sum(w).as("a"), sum(w * col("__x1")).as("b"),
          sum(w * col("__x2")).as("c"),
          sum(w * col("__x1") * col("__x1")).as("dd"),
          sum(w * col("__x1") * col("__x2")).as("e"),
          sum(w * col("__x2") * col("__x2")).as("f"),
          sum(col("__y") - mu).as("g1"),
          sum((col("__y") - mu) * col("__x1")).as("g2"),
          sum((col("__y") - mu) * col("__x2")).as("g3"))
        q.head() // materialize so AQE's FINAL plan carries the subtrees
        org.apache.spark.sql.execution.debug.codegenString(
          q.queryExecution.executedPlan)
      }
      val s1 = src(1); val s2 = src(2)
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/cg1.txt"),
        s1.getBytes("UTF-8"))
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/cg2.txt"),
        s2.getBytes("UTF-8"))
      println(s"identical=${s1 == s2} len1=${s1.length} len2=${s2.length}")
      spark.stop()
      return
    }
    run("A-literals")(litStep)
    run("B-params")(paramStep)
    run("A2-literals")(litStep)
    run("B2-params")(paramStep)
    spark.stop()
  }
}
