package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture log materialization: collapse an ordered
  * insert/update/delete log to the final table state, honoring
  * tombstones. The delete-aware sibling of the q101 latest-by-key and
  * q190 MERGE shapes: a key whose LAST log entry is a delete vanishes
  * from the state (it is not merely "latest value wins").
  *
  * One shuffle on the key; the row_number window and the per-key
  * bookkeeping aggregate share its partitioning. State size is
  * live-key-bounded regardless of log length — the 100-TB-log contract.
  */
object Cdc {

  /** `op` column values equal to `deleteOp` are tombstones; everything
    * else carries `valueCols`. Order within a key is (ts, tie) — tie
    * must make the ordering total or the "last" entry is undefined.
    * Output per surviving key: key, valueCols… (from the last entry),
    * n_ops (all log entries for the key, tombstones included),
    * last_ts.
    */
  def applyLog(log: DataFrame, key: String, ts: String, tie: String,
               op: String, valueCols: Seq[String],
               deleteOp: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col(tie).desc)
    val ranked = log
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nops", count(lit(1)).over(Window.partitionBy(col(key))))
    ranked.filter(col("__rn") === 1 && col(op) =!= deleteOp)
      .select((col(key) +: valueCols.map(col)) ++
        Seq(col("__nops").as("n_ops"), col(ts).as("last_ts")): _*)
  }
}
