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

  /** MASE backtest per key (X267) — the scale-free score
    * [[seasonalNaive]]'s MAPE family can't give on series that touch
    * zero (Hyndman & Koehler 2006). Split each key's series in bucket
    * order (first ⌊n/2⌋ buckets train, rest test — the varBacktest
    * convention); the seasonal-naive forecast over the FULL series
    * scores the test half (test forecasts may read actual train
    * history, the standard protocol), and the scale is the TRAIN-half
    * in-sample seasonal-naive MAE. MASE = test MAE / train scale:
    * < 1 beats the naive forecaster where it was fit, honestly
    * comparable across series of any magnitude.
    *
    * One row_number/count window pair + one lag window (all share the
    * per-key sort), two conditional aggregates. Keys whose train half
    * can't produce a lag (≤ season train rows) or whose scale is 0
    * yield null mase; keys with an empty scored test half drop out.
    *
    * Output per key: (key, n_train, n_test_scored, test_mae 4dp,
    * train_scale 4dp, mase 4dp). */
  def maseSplit(df: DataFrame, key: String, bucket: String,
                value: String, season: Int): DataFrame = {
    require(season >= 1, "season must be >= 1")
    val wOrd = Window.partitionBy(col(key)).orderBy(col(bucket))
    val wKey = Window.partitionBy(col(key))
    val v = col(value).cast("double")
    val scored = df
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wKey))
      .withColumn("__f", lag(v, season).over(wOrd))
      .withColumn("__train", col("__rn") <= floor(col("__n") / 2))
    scored.groupBy(col(key))
      .agg(
        sum(when(col("__train"), 1L).otherwise(0L)).as("n_train"),
        sum(when(!col("__train") && col("__f").isNotNull, 1L)
          .otherwise(0L)).as("n_test_scored"),
        avg(when(!col("__train") && col("__f").isNotNull,
          abs(v - col("__f")))).as("__mae"),
        avg(when(col("__train") && col("__f").isNotNull,
          abs(v - col("__f")))).as("__scale"))
      .filter(col("n_test_scored") > 0)
      .select(col(key), col("n_train"), col("n_test_scored"),
        round(col("__mae"), 4).as("test_mae"),
        round(col("__scale"), 4).as("train_scale"),
        round(col("__mae") / nullif(col("__scale"), lit(0.0)), 4)
          .as("mase"))
  }
}
