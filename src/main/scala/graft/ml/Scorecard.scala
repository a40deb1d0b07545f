package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Credit-scorecard feature screening: weight of evidence and
  * information value (Siddiqi 2006), plus smoothed target (mean)
  * encoding (Micci-Barreca 2001) — the two standard ways to turn a
  * categorical column into a model-ready numeric against a binary
  * target. Both are one conditional aggregate to the category grain;
  * the IV total and the global prior ride a window / 1-row broadcast
  * over that category-bounded frame, never the facts.
  */
object Scorecard {

  /** Weight of evidence per bucket of a categorical feature against a
    * 0/1 target, with the feature's total information value repeated
    * per row (the screening readout: IV < 0.02 useless, > 0.5
    * suspicious). WoE = ln(share of positives in bucket / share of
    * negatives in bucket); buckets with a zero cell yield null WoE and
    * contribute 0 to IV (the standard convention made explicit rather
    * than an infinity). Output: (bucket, n BIGINT, n_pos BIGINT,
    * pos_share 6dp, neg_share 6dp, woe 6dp, iv 6dp). */
  def woeIv(df: DataFrame, bucketCol: String,
            targetCol: String): DataFrame = {
    val t = col(targetCol).cast("int")
    val cell = df.filter(t.isNotNull)
      .groupBy(col(bucketCol))
      .agg(count(lit(1)).as("n"),
        sum(t.cast("long")).as("n_pos"))
    val wAll = Window.partitionBy()
    val pos = col("n_pos").cast("double") /
      sum(col("n_pos")).over(wAll)
    val neg = (col("n") - col("n_pos")).cast("double") /
      sum(col("n") - col("n_pos")).over(wAll)
    val woe = when(pos > 0 && neg > 0, log(pos / neg))
    val ivTerm = coalesce((pos - neg) * woe, lit(0.0))
    cell.select(col(bucketCol), col("n"), col("n_pos"),
      round(pos, 6).as("pos_share"),
      round(neg, 6).as("neg_share"),
      round(woe, 6).as("woe"),
      round(sum(ivTerm).over(wAll), 6).as("iv"))
  }

  /** Smoothed target encoding per category: enc = (n·mean_cat +
    * m·mean_global)/(n + m) — the additive-smoothing posterior that
    * shrinks rare categories toward the prior instead of memorizing
    * noise (m is the pseudo-count weight of the prior). Output:
    * (category, n BIGINT, cat_mean 6dp, encoded 6dp); the global mean
    * is a 1-row broadcast crossJoin over the category-grain frame. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   m: Double = 20.0): DataFrame = {
    require(m >= 0, "smoothing weight m must be >= 0")
    val t = col(targetCol).cast("double")
    val nn = df.filter(t.isNotNull)
    val cell = nn.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(t).as("__s"))
    val prior = nn.agg(
      (sum(t) / count(lit(1))).as("__gmean"))
    val nD = col("n").cast("double")
    cell.crossJoin(broadcast(prior))
      .select(col(catCol), col("n"),
        round(col("__s") / nD, 6).as("cat_mean"),
        round((col("__s") + lit(m) * col("__gmean")) / (nD + lit(m)), 6)
          .as("encoded"))
  }

  /** Empirical-Bayes beta-binomial shrinkage of per-unit success
    * rates: fit Beta(α, β) to the observed unit rates by method of
    * moments (c = m(1−m)/v − 1, α = mc, β = (1−m)c over the
    * population mean m and variance v of the raw rates), then report
    * each unit's posterior mean (x + α)/(n + α + β) — the
    * learn-the-prior-from-the-data version of [[targetEncode]]: a
    * 1/1 unit reads ~the prior, a 900/1000 unit keeps its rate. The
    * standard CTR / conversion-rate smoother.
    *
    * One aggregate to unit grain, one 1-row MoM frame broadcast back.
    * Output: (unit, n BIGINT, x BIGINT, raw_rate 6dp, alpha 4dp,
    * beta 4dp, posterior 6dp); a degenerate prior (zero variance or
    * v ≥ m(1−m)) yields null alpha/beta and posterior = raw rate. */
  def ebBetaBinomial(df: DataFrame, unitCol: String,
                     xCol: String): DataFrame = {
    val xv = col(xCol).cast("int")
    val unit = df.filter(xv.isNotNull)
      .groupBy(col(unitCol))
      .agg(count(lit(1)).as("n"), sum(xv.cast("long")).as("x"))
    val rate = col("x").cast("double") / col("n")
    val prior = unit.agg(avg(rate).as("__m"),
      var_pop(rate).as("__v"))
    val c = when(col("__v") > 0 &&
        col("__m") * (lit(1.0) - col("__m")) / col("__v") > 1,
      col("__m") * (lit(1.0) - col("__m")) / col("__v") - 1)
    val moments = prior.select(col("__m"),
      (col("__m") * c).as("__alpha"),
      ((lit(1.0) - col("__m")) * c).as("__beta"))
    unit.crossJoin(broadcast(moments))
      .select(col(unitCol), col("n"), col("x"),
        round(rate, 6).as("raw_rate"),
        round(col("__alpha"), 4).as("alpha"),
        round(col("__beta"), 4).as("beta"),
        round(coalesce(
          (col("x") + col("__alpha")) /
            (col("n") + col("__alpha") + col("__beta")),
          rate), 6).as("posterior"))
  }
}
