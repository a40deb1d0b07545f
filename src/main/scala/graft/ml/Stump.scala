package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-stump split scan: the single most informative threshold of
  * a numeric feature against a binary target, by exact Gini impurity
  * reduction over EVERY candidate split — the CART building block (and
  * the fastest useful answer to "does this feature separate the
  * classes at all", feature screening's nonlinear complement to
  * [[Scorecard.woeIv]]).
  *
  * Scale shape: the facts collapse to (group, value) cells first, so
  * the cumulative scan runs over the value DOMAIN per group — one hash
  * aggregate at value grain, one ordered window per group over cells,
  * one argmax. No per-row sort of the fact table, no quadratic
  * candidate × row pass.
  */
object Stump {

  /** Best split per group: threshold t maximizing
    * gini(parent) − [n_≤·gini(≤t) + n_>·gini(>t)]/n, where candidates
    * are the distinct feature values (split "v ≤ t"; the largest value
    * is excluded — its right side is empty). Ties take the smallest
    * threshold. Output: (group, n BIGINT, gini_parent 4dp, threshold,
    * rate_left 4dp, rate_right 4dp, gain 4dp); single-value groups
    * drop out (no candidate split). */
  def giniStump(df: DataFrame, groupCol: String, featureCol: String,
                targetCol: String): DataFrame = {
    val t = col(targetCol).cast("int")
    val v = col(featureCol)
    val cells = df.filter(t.isNotNull && v.isNotNull)
      .groupBy(col(groupCol).as("__g"), v.as("__v"))
      .agg(count(lit(1)).as("__c"), sum(t.cast("long")).as("__p"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
    val scanned = cells
      .withColumn("__nl", sum(col("__c")).over(wCum))
      .withColumn("__pl", sum(col("__p")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__ptot", sum(col("__p")).over(wAll))
      .filter(col("__nl") < col("__n")) // right side must be non-empty
    def gini(p: org.apache.spark.sql.Column,
             n: org.apache.spark.sql.Column) = {
      val r = p.cast("double") / n
      lit(1.0) - r * r - (lit(1.0) - r) * (lit(1.0) - r)
    }
    val nl = col("__nl"); val nr = col("__n") - col("__nl")
    val pl = col("__pl"); val pr = col("__ptot") - col("__pl")
    val weighted = (nl.cast("double") * gini(pl, nl) +
      nr.cast("double") * gini(pr, nr)) / col("__n")
    val parent = gini(col("__ptot"), col("__n"))
    val scored = scanned.select(col("__g"), col("__v"), col("__n"),
      parent.as("__gp"), weighted.as("__gs"),
      (pl.cast("double") / nl).as("__rl"),
      (pr.cast("double") / nr).as("__rr"))
    val wBest = Window.partitionBy(col("__g"))
      .orderBy((col("__gp") - col("__gs")).desc, col("__v").asc)
    scored.withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col("__g").as(groupCol), col("__n").as("n"),
        round(col("__gp"), 4).as("gini_parent"),
        col("__v").as("threshold"),
        round(col("__rl"), 4).as("rate_left"),
        round(col("__rr"), 4).as("rate_right"),
        round(col("__gp") - col("__gs"), 4).as("gain"))
  }
}
