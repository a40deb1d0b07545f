package graft.tools

import org.apache.spark.sql.SparkSession

import graft.catalog.Catalog

/** Plan audit: prints the formatted physical plan of selected catalog
  * queries so pushdown / broadcast / codegen can be inspected. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // session conf MIRRORS Bench/Verify (ansi off, UTC, 32-ish shuffle
    // partitions scaled down) — auditing plans under a different conf
    // would show different cast/divide variants than the ones benched
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // NOTE: only LAZY catalog entries belong here — queries whose
    // operators materialize eagerly during construction (q73's pinned
    // assignment, q80's driver-path iteration) would run real jobs and
    // explain only a post-hoc RDD scan, not the plan of interest.
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q2_filter_revenue", "q3_broadcast_join", "q12_degree_centrality",
      "q24_ngram_jaccard", "q25_simhash_banded", "q28_ann_topk",
      "q70_asof_join", "q71_range_join", "q75_robust_outliers",
      "q77_funnel", "q78_winsorize",
      // round-7 lazy entries (the checkpointing operators — q124, q127-
      // q130, q133 — materialize during construction and can't be
      // audited here)
      "q125_attribution", "q126_time_weighted_avg",
      "q134_seasonal_anomaly", "q135_datetime_scalars", "q136_spatial_nn",
      // round-8 lazy entries (q296/q297 materialize in construction)
      "q285_seq_pairs", "q286_entropy_rate", "q288_burst_ratio",
      "q289_page_hinkley", "q291_sharpe_sortino",
      "q293_interarrival_expfit", "q294_vocab_coverage",
      "q295_novel_bigrams",
      // round-8 session-2 lazy entries: the kernel-scan eval scores
      // (BLEU/ROUGE — expect ONE whole-stage-codegen'd scan, no
      // shuffle before the final 1-row aggregate), the text screens,
      // and the tail-risk/forecast windows. (The GLM/driver-loop
      // family — q379, q384-q386, q389, q391 — materializes its
      // Newton aggregates during construction and can't be audited
      // here; q383's kernel IS its plan.)
      "q370_weighted_kappa", "q373_expected_shortfall", "q374_mase",
      "q380_char_entropy", "q381_collocations", "q382_good_turing",
      "q383_bleu", "q387_rouge_l", "q393_mood_median")
    val qs = Catalog.queries
    names.foreach { n =>
      println(s"\n================ $n ================")
      qs.get(n) match {
        case Some(q) => q(spark, sfDir).explain("formatted")
        case None => println(s"(unknown query '$n' — known: ${qs.keys.toSeq.sorted.mkString(", ")})")
      }
    }
    spark.stop()
  }
}
