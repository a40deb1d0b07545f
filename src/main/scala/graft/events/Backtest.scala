package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecast backtesting harness: score a forecasting rule against the
  * realized series on a rolling-origin holdout. The first rule every
  * production system baselines against is seasonal-naive
  * (ŷ_t = y_{t−season}); a model that can't beat it isn't deployed
  * (the M-competition discipline). One lag window per key — no
  * training pass, the whole harness is a projection over the series.
  */
object Backtest {

  /** Seasonal-naive backtest per key: forecast = value `season`
    * buckets back; rows without a forecast (the warm-up prefix) are
    * excluded from scoring. MAPE scores only rows with actual ≠ 0
    * (its standard domain); sMAPE uses the symmetric 2|e|/(|y|+|ŷ|)
    * form and skips rows where both are zero. Output per key:
    * (key, n_scored, mae 4dp, rmse 4dp, mape 4dp, smape 4dp).
    */
  def seasonalNaive(df: DataFrame, key: String, bucket: String,
                    value: String, season: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
    val v = col(value).cast("double")
    // __e must derive from the materialized __f COLUMN: a fresh
    // lag().over() here would re-window the already-filtered frame and
    // shift every forecast.
    val scored = df.withColumn("__f", lag(v, season).over(w))
      .filter(col("__f").isNotNull)
      .withColumn("__e", v - col("__f"))
    scored.groupBy(col(key))
      .agg(count(lit(1)).as("n_scored"),
        round(avg(abs(col("__e"))), 4).as("mae"),
        round(sqrt(avg(col("__e") * col("__e"))), 4).as("rmse"),
        round(avg(when(v =!= 0, abs(col("__e")) / abs(v))), 4).as("mape"),
        round(avg(when(abs(v) + abs(col("__f")) =!= 0,
          lit(2.0) * abs(col("__e")) / (abs(v) + abs(col("__f"))))), 4)
          .as("smape"))
  }
}
