package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Erlang-C staffing from an event log: arrival rate λ and mean
  * service time s give the offered load a = λ·s in Erlangs; the
  * smallest agent count c with wait probability
  * ErlangC(c, a) = (aᶜ/c!)/((1−a/c)·Σ_{k<c} aᵏ/k! + aᶜ/c!) under the
  * target answers "how many parallel servers does this queue need" —
  * the call-center/connection-pool capacity formula, computed here
  * with no factorial overflow: ln(aᵏ/k!) = k·ln a − Σ_{j≤k} ln j
  * rides one cumulative window over a broadcast c-grid (two cumsums,
  * no iteration, exact for every c in the grid).
  */
object Staffing {

  /** Per key over (start, end) interval micros (the q298/q329
    * convention): λ = n/span, s = mean duration. Output: (key,
    * arrivals_per_hour 4dp, avg_service_sec 4dp, offered_erlangs 4dp,
    * c_req INT — smallest c ≤ maxC with P(wait) ≤ targetWait,
    * p_wait 4dp at that c); keys whose load exceeds the grid emit
    * c_req = null with p_wait at maxC (visible saturation, never a
    * silent cap). */
  def erlangStaffing(df: DataFrame, key: String, startCol: String,
                     endCol: String, targetWait: Double = 0.2,
                     maxC: Int = 60): DataFrame = {
    require(targetWait > 0 && targetWait < 1 && maxC >= 1)
    val dur = (col(endCol) - col(startCol)).cast("double")
    val agg = df.groupBy(col(key))
      .agg(count(lit(1)).as("__n"),
        min(col(startCol)).as("__t0"), max(col(endCol)).as("__t1"),
        avg(dur).as("__dsec"))
      .select(col(key),
        (col("__n") / nullif((col("__t1") - col("__t0"))
          .cast("double"), lit(0.0)) * 1e6).as("__lam"),
        (col("__dsec") / 1e6).as("__s"))
      .withColumn("__a", col("__lam") * col("__s"))
      .filter(col("__a").isNotNull && col("__a") > 0)
    val grid = df.sparkSession
      .createDataFrame((1 to maxC).map(Tuple1(_))).toDF("__c")
    val wCum = Window.partitionBy(col(key)).orderBy(col("__c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lnTerm = col("__c") * log(col("__a")) - col("__lnfact")
    val scanned = agg.crossJoin(broadcast(grid))
      .withColumn("__lnfact", sum(log(col("__c"))).over(wCum))
      .withColumn("__term", exp(lnTerm))
      // Σ_{k=0..c-1} term_k = 1 (k=0) + cumsum(term) - term_c
      .withColumn("__csum",
        lit(1.0) + sum(col("__term")).over(wCum) - col("__term"))
    val rho = col("__a") / col("__c")
    val pWait = when(rho >= 1, lit(1.0))
      .otherwise(col("__term") /
        ((lit(1.0) - rho) * col("__csum") + col("__term")))
    val evaluated = scanned.withColumn("__pw", pWait)
    val wBest = Window.partitionBy(col(key))
      .orderBy(col("__c").asc)
    val feasible = evaluated.filter(col("__pw") <= targetWait)
      .withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col(key), col("__c").as("c_req"), col("__pw"))
    val atMax = evaluated.filter(col("__c") === maxC)
      .select(col(key), col("__pw").as("__pwMax"))
    agg.join(feasible, Seq(key), "left")
      .join(atMax, Seq(key))
      .select(col(key),
        round(col("__lam") * 3600, 4).as("arrivals_per_hour"),
        round(col("__s"), 4).as("avg_service_sec"),
        round(col("__a"), 4).as("offered_erlangs"),
        col("c_req"),
        round(coalesce(col("__pw"), col("__pwMax")), 4).as("p_wait"))
  }
}
