package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inequality / concentration measures over a pre-aggregated
  * (group, unit, integer-value) frame: Gini coefficient, Herfindahl–
  * Hirschman concentration index, and the Theil-T within/between
  * decomposition. The reporting companions to [[Contribution.pareto]] —
  * "how concentrated is spend/revenue/exposure within each segment" is
  * the other half of every 80/20 readout.
  *
  * Determinism across engines: every input is integer fixed-point units
  * (cents), so all ranking-critical sums (Σx, Σi·x, per-key totals) are
  * exact BIGINTs; only the final ratio/log aggregates touch doubles, and
  * those are rounded. Every window partitions by the group key and runs
  * over the PRE-AGGREGATED unit table (one row per unit, bounded by the
  * unit-key domain — customers, suppliers — never the fact table), the
  * same scale shape as [[Rfm.segments]].
  *
  * BIGINT headroom: the rank-weighted sum Σ i·xᵢ is bounded by
  * n²·max(x); with cents values this overflows past ~10⁹ units per
  * group — at that scale switch the accumulator to DECIMAL(38,0) (the
  * formula is unchanged). Documented rather than auto-dispatched: the
  * catalog's unit domains are dimension-bounded.
  */
object Inequality {

  /** Per-group Gini coefficient over non-negative integer unit values:
    * G = (2·Σᵢ i·x₍ᵢ₎) / (n·Σx) − (n+1)/n with x ascending, ties broken
    * by the unit key so the rank weighting is engine-identical (for
    * tied values the SUM of rank weights is invariant anyway — the
    * tie-break pins the per-row attribution, the aggregate is exact
    * either way).
    *
    * Output: (group, n_units BIGINT, total BIGINT, gini 6dp; null gini
    * for a zero-total group).
    */
  def gini(df: DataFrame, groupCol: String, unitCol: String,
           valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(unitCol).asc)
    // Complete-case on the value axis (fuzz-43): a null-value unit has
    // no place in the ascending rank — engines sort nulls at OPPOSITE
    // ends (Spark first, DuckDB last), shifting every rank weight i and
    // silently counting a valueless unit in n while Σx skips it.
    df.filter(col(valueCol).isNotNull)
      .withColumn("__i", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"),
        sum(col(valueCol)).as("total"),
        sum(col("__i") * col(valueCol)).as("__ix"))
      .select(col(groupCol), col("n_units"), col("total"),
        round(
          (lit(2.0) * col("__ix")) /
            (col("n_units") * col("total")).cast("double") -
            (col("n_units") + lit(1)).cast("double") / col("n_units"),
          6).as("gini"))
  }

  /** Per-group Herfindahl–Hirschman index over per-firm integer values:
    * HHI = Σ (xᵢ/X)² × 10000 (the antitrust-convention 0–10000 scale),
    * plus the largest firm's share (CR1). Shares are ratios of exact
    * integers; only the Σ share² accumulation is floating-point, and it
    * is rounded to 4 dp (terms ≤ 1, noise ~1e-12).
    *
    * Output: (group, n_firms BIGINT, total BIGINT, hhi 4dp, top_share
    * 6dp).
    */
  def hhi(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_firms"),
        sum(col(valueCol)).as("total"),
        sum(col(valueCol).cast("double") * col(valueCol)).as("__ss"),
        max(col(valueCol)).as("__mx"))
      .select(col(groupCol), col("n_firms"), col("total"),
        round(col("__ss") / (col("total").cast("double") * col("total"))
          * lit(10000.0), 4).as("hhi"),
        round(col("__mx") / col("total").cast("double"), 6).as("top_share"))

  /** Theil-T within/between decomposition over (group, unit, value>0):
    * per group the within-group Theil T_g = Σᵢ (xᵢ/X_g) ln(xᵢ·n_g/X_g),
    * its population-weighted contribution w_g·T_g (w_g = X_g/X), and the
    * between-group term w_g·ln(w_g / (n_g/N)). Summing the last two
    * columns over groups reproduces total Theil exactly (the additive
    * decomposability that makes Theil the segmentable inequality
    * measure, unlike Gini). Zero-value units must be pre-filtered
    * (ln 0); enforced upstream by construction here.
    *
    * Output: (group, n_units BIGINT, total BIGINT, theil_within 6dp,
    * within_term 6dp, between_term 6dp).
    */
  def theilDecomposition(df: DataFrame, groupCol: String,
                         valueCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"),
        sum(col(valueCol)).as("total"),
        // Σ x ln x with exact-integer x: the only per-unit float term.
        sum(col(valueCol).cast("double") * log(col(valueCol).cast("double")))
          .as("__xlx"))
    val tot = g.agg(sum(col("n_units")).as("__n"),
      sum(col("total")).as("__x"))
    // T_g = Σ (x/X_g) ln(x n_g / X_g) = (Σ x ln x)/X_g − ln(X_g/n_g)
    g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_units"), col("total"),
        round(col("__xlx") / col("total").cast("double") -
          log(col("total").cast("double") / col("n_units")), 6)
          .as("theil_within"),
        round((col("total").cast("double") / col("__x")) *
          (col("__xlx") / col("total").cast("double") -
            log(col("total").cast("double") / col("n_units"))), 6)
          .as("within_term"),
        round((col("total").cast("double") / col("__x")) *
          log((col("total").cast("double") / col("__x")) /
            (col("n_units").cast("double") / col("__n"))), 6)
          .as("between_term"))
  }

  /** Atkinson inequality index per group — the welfare-grounded member
    * of the family ([[gini]] is rank-based, [[theilDecomposition]]
    * entropy-based): A_ε = 1 − EDE/mean, where the equally-distributed
    * equivalent is the power mean of order 1−ε (geometric mean at
    * ε = 1). ε is society's inequality aversion — A rises toward 1 as
    * the chosen ε weights the poor more. Values must be positive (the
    * log/power means are undefined otherwise — filtered out with a
    * count reported). One aggregate. Output: (group, n BIGINT,
    * n_nonpos BIGINT, mean 4dp, ede 4dp, atkinson 6dp). */
  def atkinson(df: DataFrame, groupCol: String, valueCol: String,
               epsilon: Double = 1.0): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val v = col(valueCol).cast("double")
    val pos = v > 0
    val agg = df.groupBy(col(groupCol))
      .agg(count(when(pos, 1)).as("n"),
        count(when(!pos || v.isNull, 1)).as("n_nonpos"),
        avg(when(pos, v)).as("__m"),
        avg(when(pos, log(v))).as("__ml"),
        avg(when(pos, pow(v, lit(1.0 - epsilon)))).as("__mp"))
    val ede =
      if (epsilon == 1.0) exp(col("__ml"))
      else pow(col("__mp"), lit(1.0 / (1.0 - epsilon)))
    agg.select(col(groupCol), col("n"), col("n_nonpos"),
      round(col("__m"), 4).as("mean"),
      round(ede, 4).as("ede"),
      round(lit(1.0) - ede / nullif(col("__m"), lit(0.0)), 6)
        .as("atkinson"))
  }
}
