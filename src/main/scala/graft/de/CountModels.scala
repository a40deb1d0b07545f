package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-model diagnostics (X90): overdispersion and the
  * method-of-moments negative-binomial fit per series — the screening
  * step before modeling event counts, deciding whether a Poisson rate
  * model is honest (D ≈ 1) or the data demand the NB's extra variance
  * (D ≫ 1, as bursty event streams always do). RNA-seq pipelines run
  * exactly this diagnostic per gene — the reference domain's count
  * tables are the canonical overdispersed data.
  *
  * Moment fit: with mean μ and sample variance s², dispersion D =
  * s²/μ, NB size r = μ²/(s²−μ) and success probability p = μ/s²
  * (defined only when s² > μ — under-dispersed series yield nulls, the
  * honest answer, not a clamped fit). One hash aggregate per key; all
  * moments from exact integer sums.
  */
object CountModels {

  /** Output: (key, n BIGINT, mean 4-dp, variance 4-dp, dispersion 4-dp,
    * nb_r 4-dp, nb_p 4-dp). */
  def overdispersion(series: DataFrame, key: String,
                     value: String): DataFrame = {
    val agg = series.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        avg(col(value)).as("__mu"),
        var_samp(col(value)).as("__s2"))
    val mu = col("__mu"); val s2 = col("__s2")
    agg.select(col(key), col("n"),
      round(mu, 4).as("mean"), round(s2, 4).as("variance"),
      when(mu > 0, round(s2 / mu, 4)).as("dispersion"),
      when(s2 > mu, round(mu * mu / (s2 - mu), 4)).as("nb_r"),
      when(s2 > mu, round(mu / s2, 4)).as("nb_p"))
  }
}
