package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

/** Benchmark main (driver contract): one JSON line with per-query and
  * total wall seconds over SPARK_GRAFT_SF_DIR.
  *
  * - Results are sunk through the `noop` data source so every computed
  *   column is fully evaluated — `.count()` would let Catalyst prune
  *   unreferenced projections (e.g. the p-value expression) out of the
  *   timed plan entirely.
  * - A warm-up pass (session init + a small scan/agg) runs before timing
  *   so the first query doesn't carry JVM + session start-up.
  * - Per-query output row counts ride along via `observe` (a
  *   CollectMetrics node over the rows already flowing to the sink — no
  *   second execution), so a silently-empty result is visible in the
  *   JSON ("rows") instead of reading as a fast success.
  * - A query that throws is reported in "failed" and EXCLUDED from the
  *   total, rather than its near-zero exception-path elapsed time
  *   deflating the headline number.
  * - The headline set keeps the round-1 queries (comparable across
  *   rounds) and adds the heavy new operators: window imputation,
  *   z-score, graph degree, sessionization, n-gram/simhash/minhash
  *   dedup, exact dedup, quality scoring, brute-force vs LSH similarity
  *   search, the graph kernels (betweenness q52, eigenvector q53),
  *   nested enrichment (q40), native session windows (q50), and key-skew
  *   diagnostics (q61) — every operator family has round-over-round perf
  *   visibility.
  */
object Bench {

  private val headline = Seq(
    "q1_pricing_agg", "q2_filter_revenue", "q3_broadcast_join",
    "q13_welch_stats", "q14_welch_pvalue", "q15_bh_fdr",
    "q4_median_impute", "q5_zscore", "q12_degree_centrality",
    "q17_sessionize", "q20_exact_dedup", "q22_quality_score",
    "q24_ngram_jaccard", "q25_simhash_banded", "q26_cosine_topk",
    "q27_lsh_buckets", "q28_ann_topk", "q32_embedding_dedup",
    "q33_minhash_lsh", "q39_sliding_window", "q40_nested_enrich",
    "q41_decontaminate", "q42_repetition", "q43_tfidf_topk",
    "q49_bm25", "q50_session_window", "q51_ivf_ann",
    "q52_betweenness", "q53_eigenvector", "q57_mixture_sample",
    "q58_gopher_rules", "q59_token_kl", "q60_incremental_dedup",
    "q61_key_skew", "q62_normalize_text", "q63_line_dedup",
    "q64_corpus_delta", "q65_gate_sweep", "q66_span_stats", "q67_span_mask",
    "q68_bloom_incremental_dedup", "q69_content_split",
    "q70_asof_join", "q71_range_join", "q72_unigram_ppl",
    "q73_semantic_dedup", "q74_markup_strip", "q75_robust_outliers",
    "q76_contamination", "q77_funnel", "q78_winsorize",
    "q79_asof_forward", "q80_pagerank", "q81_salted_join",
    "q82_source_dup_matrix", "q83_padding_efficiency", "q84_rollup",
    "q85_analytics", "q86_setops", "q87_cube", "q88_vector_ops")

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

    // Best-of-3 per query: later runs amortize one-time codegen / JIT and
    // shield the recorded number from transient host noise (a contended
    // recording once masqueraded as a 2x regression). Protocol note:
    // rounds 1-5 recorded best-of-2 — the "runs" field in the JSON marks
    // which protocol a snapshot used, so cross-round deltas near the
    // noise floor should be read against same-runs recordings.
    val runsPerQuery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val queries = SparkEntry.queries
    val results: Seq[(String, Either[String, (Double, Long)])] =
      headline.map { name =>
        queries.get(name) match {
          // a renamed/missing headline query must surface in "failed",
          // not silently shrink the total into a fake speedup
          case None =>
            System.err.println(s"[bench] $name missing from the catalog")
            name -> Left("missing")
          case Some(fn) =>
          try {
            var rows = 0L
            val times = (1 to runsPerQuery).map { i =>
              // operators may persist internal multi-consumer frames; clear
              // between runs so no query is timed against another's cache
              spark.catalog.clearCache()
              val obs = Observation(s"$name-$i")
              val t0 = System.nanoTime()
              fn(spark, sfDir).observe(obs, count(lit(1)).as("rows"))
                .write.format("noop").mode("overwrite").save()
              val dt = (System.nanoTime() - t0) / 1e9
              rows = obs.get("rows").asInstanceOf[Long]
              dt
            }
            name -> Right((times.min, rows))
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              name -> Left(e.getClass.getSimpleName)
          }
        }
      }
    val ok = results.collect { case (n, Right(v)) => n -> v }
    val failed = results.collect { case (n, Left(_)) => n }
    val qs = ok.map { case (k, (t, _)) => "\"" + k + "\":" + t }
      .mkString("{", ",", "}")
    val rows = ok.map { case (k, (_, r)) => "\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    val fails = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2._1).sum
    // Host load (1/5/15-min averages) rides along so a recording taken
    // under contention is self-identifying instead of reading as a
    // regression of the binary.
    val load = try {
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString("[", ",", "]")
    } catch { case _: Throwable => "[]" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rows,"failed":$fails,"loadavg":$load,"runs":$runsPerQuery,"sf":"$sfDir"}""")
    spark.stop()
  }
}
