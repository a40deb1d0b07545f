package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ABC (Pareto) inventory classification: rank entities by value
  * contribution, classify by cumulative share — A carries the first
  * 80% of value, B the next 15%, C the tail. The class boundary test
  * runs in EXACT integer arithmetic (cum·100 ≤ pct·total on integer
  * value units), so no float-boundary flapping can move an entity
  * between classes across engines — the q131 integer-axis discipline.
  */
object Abc {

  /** `valueCents` must be an integer value column (cents — callers
    * aggregate with the round(sum(x)*100)::long convention). Ranking
    * is (value desc, key asc), fully deterministic. Output per key:
    * (key, value_cents, rank, cum_share 4dp, abc_class).
    */
  def classify(df: DataFrame, key: String, valueCents: String,
               aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(0 < aPct && aPct < bPct && bPct <= 100, "0 < aPct < bPct <= 100")
    val w = Window.orderBy(col(valueCents).desc, col(key).asc)
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(lit(1))
    df.select(col(key), col(valueCents))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col(valueCents)).over(wc))
      .withColumn("__tot", sum(col(valueCents)).over(tot))
      .select(col(key), col(valueCents), col("rank"),
        round(col("__cum").cast("double") / col("__tot"), 4)
          .as("cum_share"),
        when(col("__cum") * 100 <= col("__tot") * aPct, "A")
          .when(col("__cum") * 100 <= col("__tot") * bPct, "B")
          .otherwise("C").as("abc_class"))
  }
}
