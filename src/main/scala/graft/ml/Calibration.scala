package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probability-calibration readouts (X103/X104): the binned
  * reliability table with expected calibration error, and the Brier
  * score with its Murphy decomposition (reliability − resolution +
  * uncertainty) — "is the 0.8 bucket actually right 80% of the time",
  * the question AUC cannot answer because it is rank-only.
  *
  * Forecasts bin by floor(p·nBins) (p = 1 clamps into the top bin) —
  * pure integer arithmetic on pre-rounded probabilities, so bin
  * membership is engine-exact. One hash aggregate over facts; every
  * downstream term is bin-domain arithmetic on exact counts and
  * cents-exact probability sums (the usage contract: p pre-rounded to
  * a fixed grid, as the catalog's 3-dp scores are).
  */
object Calibration {

  /** Reliability table: (bin 0..n−1, n, n_pos, mean_p 4-dp,
    * frac_pos 4-dp, gap 4-dp = |frac − mean_p|) plus ece 4-dp
    * (Σ n_b/N·gap_b, same value on every row). `probCol` in [0,1]. */
  def reliability(df: DataFrame, labelCol: String, probCol: String,
                  nBins: Int = 10): DataFrame = {
    require(nBins >= 2)
    val p = col(probCol)
    val binned = df.withColumn("__bin",
      least(lit(nBins - 1L), floor(p * nBins).cast("long")))
    val byBin = binned.groupBy(col("__bin").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol)).as("n_pos"),
        sum(p).as("__sump"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val meanP = col("__sump") / col("n")
    val frac = col("n_pos").cast("double") / col("n")
    byBin
      .withColumn("__gap", abs(frac - meanP))
      .withColumn("ece",
        round(sum(col("n") * col("__gap")).over(wAll) /
          sum(col("n")).over(wAll), 4))
      .select(col("bin"), col("n"), col("n_pos"),
        round(meanP, 4).as("mean_p"), round(frac, 4).as("frac_pos"),
        round(col("__gap"), 4).as("gap"), col("ece"))
  }

  /** One-row Brier panel: (n, brier 4-dp = mean (p−y)², reliability
    * 4-dp, resolution 4-dp, uncertainty 4-dp — the Murphy
    * decomposition over the same bins; brier ≈ rel − res + unc up to
    * within-bin probability variance, which the REL term absorbs when
    * forecasts are binned on their own grid). */
  def brierDecomposition(df: DataFrame, labelCol: String, probCol: String,
                         nBins: Int = 10): DataFrame = {
    val p = col(probCol)
    val y = col(labelCol).cast("double")
    val binned = df.withColumn("__bin",
      least(lit(nBins - 1L), floor(p * nBins).cast("long")))
    val byBin = binned.groupBy(col("__bin"))
      .agg(count(lit(1)).as("__n"), sum(y).as("__pos"),
        sum(p).as("__sump"))
    val tot = binned.agg(count(lit(1)).as("n"),
      sum(y).as("__allpos"),
      sum((p - y) * (p - y)).as("__sqerr"))
    val ok = col("__pos").cast("double") / col("__n")
    val mp = col("__sump") / col("__n")
    val base = col("__allpos").cast("double") / col("n")
    val terms = byBin.crossJoin(broadcast(tot))
      .agg(
        first(col("n")).as("n"),
        sum(col("__n") * (mp - ok) * (mp - ok)).as("__rel"),
        sum(col("__n") * (ok - base) * (ok - base)).as("__res"),
        first(col("__sqerr")).as("__sq"),
        first(base).as("__base"))
    terms.select(col("n"),
      round(col("__sq") / col("n"), 4).as("brier"),
      round(col("__rel") / col("n"), 4).as("reliability"),
      round(col("__res") / col("n"), 4).as("resolution"),
      round(col("__base") * (lit(1.0) - col("__base")), 4)
        .as("uncertainty"))
  }

  /** Hosmer–Lemeshow goodness-of-fit for a fitted binary probability
    * (X284) — the classic "are the predicted probabilities ACTUALLY
    * probabilities" decile test [[reliability]]'s fixed-width bins
    * don't give: rows sort into `bins` equal-count groups by p̂
    * (ntile over the deterministic (p̂, id) order), and
    * HL = Σ_g (o_g − e_g)² / (e_g·(1 − e_g/n_g)) is χ²_{bins−2}
    * under a well-calibrated model. `bins` must be EVEN so the
    * χ² survival has the exact closed form
    * e^{−x/2}·Σ_{i<k/2} (x/2)^i/i! (no numeric integration — the
    * q322 even-dof discipline). Groups with degenerate expectation
    * (e_g = 0 or n_g) contribute 0 with a flagged count.
    *
    * One ntile window (total-order contract: idCol breaks p̂ ties
    * deterministically) + one bin aggregate + a bins-bounded readout.
    * Output (one row): n BIGINT, bins, hl_stat 4dp, dof,
    * n_degenerate_bins BIGINT, p_value 6dp. */
  def hosmerLemeshow(df: DataFrame, labelCol: String, probCol: String,
                     idCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 4 && bins % 2 == 0,
      "bins must be even and >= 4 (closed-form even-dof chi2 tail)")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(probCol).asc, col(idCol).asc)
    val g = df
      .filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("__g", ntile(bins).over(w))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("ng"),
        sum(col(labelCol).cast("double")).as("og"),
        sum(col(probCol).cast("double")).as("eg"))
    val degen = col("eg") <= 0.0 || col("eg") >= col("ng")
    val term = when(degen, lit(0.0))
      .otherwise((col("og") - col("eg")) * (col("og") - col("eg")) /
        (col("eg") * (lit(1.0) - col("eg") / col("ng"))))
    val dof = bins - 2
    val agg = g.agg(sum(col("ng")).as("n"),
      sum(term).as("__hl"),
      sum(when(degen, 1L).otherwise(0L)).as("n_degenerate_bins"))
    // even-dof chi2 survival: exp(-x/2) * sum_{i<dof/2} (x/2)^i / i!
    val half = col("__hl") / 2
    val series = (0 until dof / 2).map { i =>
      val fact = (1 to i).foldLeft(1.0)(_ * _)
      pow(half, i) / lit(fact)
    }.reduce(_ + _)
    agg.select(col("n"), lit(bins).as("bins"),
      round(col("__hl"), 4).as("hl_stat"), lit(dof).as("dof"),
      col("n_degenerate_bins"),
      round(exp(-half) * series, 6).as("p_value"))
  }
}
