package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newsvendor stock optimization from the empirical demand
  * distribution: the optimal order quantity under underage cost c_u
  * (lost margin per unit short) and overage cost c_o (holding/waste
  * per unit over) is the demand quantile at the critical ratio
  * c_u/(c_u + c_o) — no distributional fit, the observed demand
  * sample IS the model. Alongside Q*, the expected per-period
  * underage/overage units and cost are evaluated EMPIRICALLY over the
  * same sample (avg of (D−Q)⁺ and (Q−D)⁺), so the readout is
  * internally consistent with the quantile choice.
  *
  * One exact-percentile aggregate to the key grain, one broadcast
  * join back over the demand rows, one closing aggregate — the
  * trimmedMean shape. */
object Inventory {

  /** Output per key: (key, n BIGINT, critical_ratio 4dp, q_opt 4dp,
    * exp_underage 4dp, exp_overage 4dp, exp_cost 4dp). */
  def newsvendor(df: DataFrame, key: String, demandCol: String,
                 cu: Double, co: Double): DataFrame = {
    require(cu > 0 && co > 0, "unit costs must be positive")
    val r = cu / (cu + co)
    val d = col(demandCol).cast("double")
    val nn = df.filter(d.isNotNull)
    val q = nn.groupBy(col(key))
      .agg(count(lit(1)).as("n"), percentile(d, lit(r)).as("__q"))
    nn.join(broadcast(q), Seq(key))
      .groupBy(col(key))
      .agg(max(col("n")).as("n"), max(col("__q")).as("__q"),
        avg(greatest(d - col("__q"), lit(0.0))).as("__under"),
        avg(greatest(col("__q") - d, lit(0.0))).as("__over"))
      .select(col(key), col("n"),
        round(lit(r), 4).as("critical_ratio"),
        round(col("__q"), 4).as("q_opt"),
        round(col("__under"), 4).as("exp_underage"),
        round(col("__over"), 4).as("exp_overage"),
        round(lit(cu) * col("__under") + lit(co) * col("__over"), 4)
          .as("exp_cost"))
  }
}
