package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classification evaluation metrics (X93/X94) from (label, prediction)
  * pairs: per-class precision/recall/F1 with supports, and the
  * agreement panel (accuracy, macro-F1, Cohen's κ). Everything reduces
  * over the CONFUSION CELLS — one hash aggregate over the pair stream,
  * then label-domain-bounded arithmetic — so a billion predictions cost
  * one map-side-combinable aggregate. All inputs to every ratio are
  * exact BIGINT counts.
  */
object Metrics {

  private def cells(df: DataFrame, labelCol: String, predCol: String) =
    df.groupBy(col(labelCol).cast("string").as("y"),
        col(predCol).cast("string").as("p"))
      .agg(count(lit(1)).as("c"))

  /** Per-class report: (class, support, tp, fp, fn, precision 4-dp,
    * recall 4-dp, f1 4-dp; null precision for a never-predicted class,
    * null f1 when both are null-degenerate). Classes = union of true
    * and predicted labels. */
  def classificationReport(df: DataFrame, labelCol: String,
                           predCol: String): DataFrame = {
    val cl = cells(df, labelCol, predCol)
    val byTrue = cl.groupBy(col("y").as("cls"))
      .agg(sum(col("c")).as("support"))
    val byPred = cl.groupBy(col("p").as("cls"))
      .agg(sum(col("c")).as("predicted"))
    val tp = cl.filter(col("y") === col("p"))
      .select(col("y").as("cls"), col("c").as("tp"))
    val base = byTrue.join(byPred, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .na.fill(0L, Seq("support", "predicted", "tp"))
    val prec = col("tp").cast("double") / nullif(col("predicted"), lit(0L))
    val rec = col("tp").cast("double") / nullif(col("support"), lit(0L))
    base.select(col("cls"), col("support"),
      col("tp"), (col("predicted") - col("tp")).as("fp"),
      (col("support") - col("tp")).as("fn"),
      round(prec, 4).as("precision"), round(rec, 4).as("recall"),
      round(lit(2.0) * col("tp") /
        nullif(col("predicted") + col("support"), lit(0L)), 4).as("f1"))
  }

  /** One-row agreement panel: (n, accuracy 4-dp, macro_f1 — classes
    * averaged over the TRUE-label domain, the sklearn convention, as a
    * snap-divided double (per-class f1 is already 4-dp, the sum snaps
    * to exact integer ten-thousandths, one exact division, NO final
    * round — the q94/q200 fuzz-44 discipline: a plain avg+round can
    * straddle a .xxxx5 under cross-engine ulps) — expected_agreement
    * 4-dp, cohens_kappa 4-dp; κ null when chance agreement is 1). */
  def agreement(df: DataFrame, labelCol: String,
                predCol: String): DataFrame = {
    val cl = cells(df, labelCol, predCol)
    val n = cl.agg(sum(col("c")).as("n"),
      sum(when(col("y") === col("p"), col("c")).otherwise(0L)).as("ok"))
    val margins = cl.groupBy(col("y").as("cls"))
      .agg(sum(col("c")).as("ny"))
      .join(cl.groupBy(col("p").as("cls")).agg(sum(col("c")).as("np")),
        Seq("cls"), "full_outer")
      .na.fill(0L, Seq("ny", "np"))
    val pe = margins.agg(sum(col("ny") * col("np")).as("__sump"))
    val f1ByClass = classificationReport(df, labelCol, predCol)
      .filter(col("support") > 0)
      .agg((round(sum(coalesce(col("f1"), lit(0.0))) * 1e4) /
        (lit(1e4) * count(lit(1)))).as("__mf1"))
    n.crossJoin(broadcast(pe)).crossJoin(broadcast(f1ByClass))
      .select(col("n"),
        round(col("ok").cast("double") / col("n"), 4).as("accuracy"),
        col("__mf1").as("macro_f1"),
        round(col("__sump").cast("double") / (col("n") * col("n")), 4)
          .as("expected_agreement"),
        when(col("__sump") < col("n") * col("n"),
          round((col("ok").cast("double") / col("n") -
            col("__sump").cast("double") / (col("n") * col("n"))) /
            (lit(1.0) - col("__sump").cast("double") /
              (col("n") * col("n"))), 4)).as("cohens_kappa"))
  }

  /** Weighted Cohen's κ for ORDINAL raters (X263): linear (w ∝ |i−j|)
    * and quadratic (w ∝ (i−j)²) penalty variants in one pass — the agreement statistic for graded labels
    * where "off by one" must cost less than "off by three" (plain κ,
    * [[agreement]], treats every disagreement equally).
    *
    * κ_w = 1 − Σ w·O / Σ w·E over the FULL category grid (absent cells
    * carry expected mass E_ij = r_i·c_j/n, so the grid is the
    * bounded cross of the two margin domains — k² rows, never facts —
    * with observed cells left-joined in and zero-filled). Every input
    * to the ratios is an exact BIGINT count; the only float terms are
    * the two k²-bounded weighted sums. Null κ when a weighted chance
    * term is 0 (single category on either side).
    *
    * Output one row: (n, n_categories, kappa_linear 4dp,
    * kappa_quadratic 4dp). Ratings must be integer-coded ordinals. */
  def weightedKappa(df: DataFrame, aCol: String,
                    bCol: String): DataFrame = {
    val cl = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast("long").as("i"),
        col(bCol).cast("long").as("j"))
      .agg(count(lit(1)).as("c"))
    val ra = cl.groupBy(col("i")).agg(sum(col("c")).as("ri"))
    val rb = cl.groupBy(col("j")).agg(sum(col("c")).as("cj"))
    // full margin-domain grid; observed cells joined back, zero-filled.
    // Weights are raw |i−j| / (i−j)² — the conventional /(k−1) and
    // /(k−1)² normalizers cancel in the 1 − ΣwO/ΣwE ratio, so they are
    // omitted rather than computed.
    val g = broadcast(ra).crossJoin(broadcast(rb))
      .join(cl, Seq("i", "j"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("__d", abs(col("i") - col("j")).cast("double"))
    val n = cl.agg(sum(col("c")).as("n"))
    val cats = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("long").as("v"))
      .union(df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
        .select(col(bCol).cast("long").as("v")))
      .agg(countDistinct(col("v")).as("n_categories"))
    val sums = g.agg(
      sum(col("__d") * col("c")).as("__ol"),
      sum(col("__d") * col("__d") * col("c")).as("__oq"),
      sum(col("__d") * col("ri") * col("cj")).as("__el"),
      sum(col("__d") * col("__d") * col("ri") * col("cj")).as("__eq"))
    n.crossJoin(broadcast(cats)).crossJoin(broadcast(sums))
      .select(col("n"), col("n_categories"),
        round(lit(1.0) - col("__ol") * col("n") /
          nullif(col("__el"), lit(0.0)), 4).as("kappa_linear"),
        round(lit(1.0) - col("__oq") * col("n") /
          nullif(col("__eq"), lit(0.0)), 4).as("kappa_quadratic"))
  }

  /** Multiclass Matthews correlation (Gorodkin's R_K) + balanced
    * accuracy panel (X264) — the two class-imbalance-honest summary
    * scores [[agreement]]'s accuracy/κ miss. R_K = (c·s − Σ tₖpₖ) /
    * √((s² − Σ pₖ²)(s² − Σ tₖ²)) over exact BIGINT confusion margins
    * (one hash aggregate over the pair stream, label-domain-bounded
    * arithmetic after); balanced accuracy = mean per-class recall over
    * the TRUE-label domain (sklearn convention). Null mcc when either
    * variance factor is 0 (all-one-class truth or prediction).
    *
    * Output one row: (n, accuracy 4dp, balanced_accuracy 4dp,
    * mcc 4dp). */
  def mccPanel(df: DataFrame, labelCol: String,
               predCol: String): DataFrame = {
    val cl = cells(df, labelCol, predCol)
    val tk = cl.groupBy(col("y").as("cls")).agg(sum(col("c")).as("t"))
    val pk = cl.groupBy(col("p").as("cls")).agg(sum(col("c")).as("pc"))
    val tpk = cl.filter(col("y") === col("p"))
      .select(col("y").as("cls"), col("c").as("tp"))
    val m = tk.join(pk, Seq("cls"), "full_outer")
      .join(tpk, Seq("cls"), "left")
      .na.fill(0L, Seq("t", "pc", "tp"))
    val agg = m.agg(
      sum(col("t")).as("__s"),
      sum(col("tp")).as("__c"),
      sum(col("t") * col("pc")).as("__tp_dot"),
      sum(col("t") * col("t")).as("__tt"),
      sum(col("pc") * col("pc")).as("__pp"),
      avg(when(col("t") > 0,
        col("tp").cast("double") / col("t"))).as("__bacc"))
    agg.select(col("__s").as("n"),
      round(col("__c").cast("double") / col("__s"), 4).as("accuracy"),
      round(col("__bacc"), 4).as("balanced_accuracy"),
      round((col("__c") * col("__s") - col("__tp_dot")).cast("double") /
        nullif(sqrt((col("__s") * col("__s") - col("__pp"))
            .cast("double") *
          (col("__s") * col("__s") - col("__tt")).cast("double")),
          lit(0.0)), 4).as("mcc"))
  }
}
