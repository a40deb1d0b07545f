package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Population stability index (X95): the distribution-shift monitor —
  * bin a metric identically over two periods (baseline A vs current B)
  * and score Σ (p_B − p_A)·ln(p_B/p_A); > 0.25 is the conventional
  * "population changed, retrain/investigate" alarm.
  *
  * Binning is the X38 integer-exact equi-width scheme over the GLOBAL
  * min/max (broadcast 1-row aggregate), so bin membership can never
  * flap cross-engine; empty-side bins are Laplace-smoothed (+1 per
  * bin, documented convention) so the log is always finite without
  * dropping the most diagnostic bins — the ones one side vacated.
  * One hash aggregate over facts → bin-domain-bounded arithmetic.
  */
object Drift {

  /** Per-bin PSI table: (bin BIGINT, lo, hi, n_a, n_b, p_a 6-dp,
    * p_b 6-dp, psi_term 6-dp); Σ psi_term is the headline PSI.
    * `periodCol` must be a boolean: true = baseline (A). Values are
    * integral (cents). */
  def psi(df: DataFrame, valueCol: String, isBaselineCol: String,
          nBins: Int = 10): DataFrame = {
    require(nBins >= 2)
    val v = col(valueCol)
    val bounds = df.agg(min(v).as("__lo"), max(v).as("__hi"))
    val binned = df.crossJoin(broadcast(bounds))
      .withColumn("__bin",
        least(lit(nBins - 1),
          ((v - col("__lo")) * nBins /
            greatest(col("__hi") - col("__lo") + 1, lit(1L)))
            .cast("long")))
    val byBin = binned.groupBy(col("__bin"))
      .agg(
        max(col("__lo")).as("__glo"), max(col("__hi")).as("__ghi"),
        sum(when(col(isBaselineCol), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col(isBaselineCol), 1L).otherwise(0L)).as("n_b"))
    val tot = byBin.agg(sum(col("n_a")).as("__ta"),
      sum(col("n_b")).as("__tb"))
    // Laplace-smoothed shares: (n + 1) / (total + nBins)
    val pa = (col("n_a") + 1).cast("double") / (col("__ta") + nBins)
    val pb = (col("n_b") + 1).cast("double") / (col("__tb") + nBins)
    byBin.crossJoin(broadcast(tot))
      .select(col("__bin").as("bin"),
        (col("__glo") + col("__bin") *
          floor((col("__ghi") - col("__glo") + 1) / nBins))
          .as("lo_approx"),
        col("n_a"), col("n_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round((pb - pa) * log(pb / pa), 6).as("psi_term"))
  }
}
