package graft.de

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential-expression stage (J2/J3, A6–A8, F4/F5;
  * `pipeline2.py:540-648`).
  *
  * Sample-group reconciliation (J2) happens on driver-side dimension data
  * (sample lists are bounded by array width, not data volume); the per-gene
  * statistics run distributed through `Stats.welchTTest` (one hash agg) and
  * `Stats.bhAdjust`.
  */
object DifferentialExpression {

  /** J2: resolve each expression sample to 'case'/'control'.
    *
    * Mirrors `reconcile_sample_ids` + the in-stage fallback
    * (`pipeline2.py:349-432,564-573`): id-match against metadata first;
    * if either group then has < 2 matched samples, fall back to an
    * arbitrary half split of ALL expression samples in source-column order
    * (first half control, rest case).
    *
    * @param sampleIds expression sample ids in source-column order
    * @param metadata  (sample_id, condition, ...) — condition may be null
    */
  def resolveGroups(sampleIds: Seq[String],
                    metadata: DataFrame): Seq[(String, String)] = {
    val meta = metadata.select("sample_id", "condition")
      .filter(col("condition").isNotNull)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    def strip(s: String) = {
      var a = 0; var b = s.length
      while (a < b && "\"' ".indexOf(s.charAt(a)) >= 0) a += 1
      while (b > a && "\"' ".indexOf(s.charAt(b - 1)) >= 0) b -= 1
      s.substring(a, b)
    }
    val matched = sampleIds.flatMap { sid =>
      meta.get(strip(sid)).map(sid -> _)
    }
    val nControl = matched.count(_._2 == "control")
    val nCase = matched.count(_._2 == "case")
    if (nControl >= 2 && nCase >= 2) matched
    else {
      val mid = sampleIds.length / 2
      sampleIds.zipWithIndex.map { case (sid, i) =>
        sid -> (if (i < mid) "control" else "case")
      }
    }
  }

  /** A6–A8 + F4/F5 over long-form gene expression.
    *
    * @param geneExpr (gene, sample_id, value)
    * @return (gene, log2FC, pvalue, adjusted_pvalue) — the reference's
    *         differential_results.csv schema (`pipeline2.py:610-627`)
    */
  def run(spark: SparkSession, geneExpr: DataFrame,
          sampleIds: Seq[String], metadata: DataFrame): DataFrame = {
    import spark.implicits._
    val groups = resolveGroups(sampleIds, metadata).toDF("sample_id", "condition")
    val joined = geneExpr.join(broadcast(groups), Seq("sample_id"))   // J3
    val tested = Stats.welchTTest(joined, Seq("gene"), "condition", "value")
      .select($"gene", $"log2fc".as("log2FC"), $"pvalue")
    Stats.bhAdjust(tested, "pvalue", "adjusted_pvalue", tieBreak = Seq("gene"))
      .select("gene", "log2FC", "pvalue", "adjusted_pvalue")
  }

  /** F5: the reference's hard-coded significance cut
    * (`pipeline2.py:639-643`): BH-adjusted p < 0.05, |log2FC| > 1, log2FC
    * not null. */
  def significant(results: DataFrame): DataFrame =
    results.filter(col("adjusted_pvalue") < 0.05 &&
      abs(col("log2FC")) > 1 && col("log2FC").isNotNull)
}
