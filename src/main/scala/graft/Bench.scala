package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query and
  * total wall seconds over SPARK_GRAFT_SF_DIR.
  *
  * - Results are sunk through the `noop` data source so every computed
  *   column is fully evaluated — `.count()` would let Catalyst prune
  *   unreferenced projections (e.g. the p-value expression) out of the
  *   timed plan entirely.
  * - A warm-up pass (session init + a small scan/agg) runs before timing
  *   so the first query doesn't carry JVM + session start-up.
  * - The headline set keeps the round-1 queries (comparable across
  *   rounds) and adds the heavy new operators: window imputation,
  *   z-score, graph degree, sessionization, n-gram/simhash dedup, and
  *   brute-force vs LSH similarity search.
  */
object Bench {

  private val headline = Seq(
    "q1_pricing_agg", "q2_filter_revenue", "q3_broadcast_join",
    "q13_welch_stats", "q14_welch_pvalue", "q15_bh_fdr",
    "q4_median_impute", "q5_zscore", "q12_degree_centrality",
    "q17_sessionize", "q24_ngram_jaccard", "q25_simhash_banded",
    "q26_cosine_topk", "q28_ann_topk", "q32_embedding_dedup",
    "q33_minhash_lsh", "q39_sliding_window")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: session, codegen, parquet footer reads.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    // Best-of-2 per query: the second run amortizes one-time codegen /
    // JIT and shields the recorded number from transient host noise.
    val queries = SparkEntry.queries
    val results = headline.flatMap { name =>
      queries.get(name).map { fn =>
        val times = (1 to 2).map { _ =>
          // operators may persist internal multi-consumer frames; clear
          // between runs so no query is timed against another's cache
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
