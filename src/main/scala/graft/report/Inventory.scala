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

  /** Syntetos–Boylan demand classification: ADI (average interdemand
    * interval = total buckets / nonzero buckets, over the GLOBAL
    * bucket domain so every item faces the same calendar) and CV²
    * (squared coefficient of variation of the NONZERO demand sizes)
    * put every item into the smooth / intermittent / erratic / lumpy
    * quadrant (cutoffs 1.32 and 0.49) — which forecaster to use
    * (SES, Croston, …) per item, the standard supply-chain triage.
    * Input is the pre-bucketed demand grain (item, bucket, qty > 0
    * rows only — zero buckets are implied by the global domain).
    * Output per class: (demand_class, n_items BIGINT, avg_adi 4dp,
    * avg_cv2 4dp), plus items with a single demand bucket classified
    * by ADI alone with CV² = 0 (documented convention). */
  def demandClasses(df: DataFrame, itemCol: String,
                    bucketCol: String, qtyCol: String): DataFrame = {
    val q = col(qtyCol).cast("double")
    val buckets = df.filter(q > 0).select(col(bucketCol)).distinct()
      .agg(count(lit(1)).as("__nb"))
    val per = df.filter(q > 0)
      .groupBy(col(itemCol))
      .agg(countDistinct(col(bucketCol)).as("__nz"),
        avg(q).as("__m"), var_pop(q).as("__v"))
    val adi = col("__nb").cast("double") / col("__nz")
    val cv2 = coalesce(col("__v") / nullif(col("__m") * col("__m"),
      lit(0.0)), lit(0.0))
    val cls = when(adi < 1.32 && cv2 < 0.49, "smooth")
      .when(adi >= 1.32 && cv2 < 0.49, "intermittent")
      .when(adi < 1.32, "erratic")
      .otherwise("lumpy")
    per.crossJoin(broadcast(buckets))
      .select(cls.as("demand_class"), adi.as("__adi"),
        cv2.as("__cv2"))
      .groupBy(col("demand_class"))
      .agg(count(lit(1)).as("n_items"),
        round(avg(col("__adi")), 4).as("avg_adi"),
        round(avg(col("__cv2")), 4).as("avg_cv2"))
  }
}
