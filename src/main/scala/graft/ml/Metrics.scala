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

  /** One-row agreement panel: (n, accuracy 4-dp, macro_f1 4-dp —
    * classes averaged over the TRUE-label domain, the sklearn
    * convention — expected_agreement 4-dp, cohens_kappa 4-dp; κ null
    * when chance agreement is 1). */
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
      .agg(avg(coalesce(col("f1"), lit(0.0))).as("__mf1"))
    n.crossJoin(broadcast(pe)).crossJoin(broadcast(f1ByClass))
      .select(col("n"),
        round(col("ok").cast("double") / col("n"), 4).as("accuracy"),
        round(col("__mf1"), 4).as("macro_f1"),
        round(col("__sump").cast("double") / (col("n") * col("n")), 4)
          .as("expected_agreement"),
        when(col("__sump") < col("n") * col("n"),
          round((col("ok").cast("double") / col("n") -
            col("__sump").cast("double") / (col("n") * col("n"))) /
            (lit(1.0) - col("__sump").cast("double") /
              (col("n") * col("n"))), 4)).as("cohens_kappa"))
  }
}
