package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation evaluation (the dbt-test / Great-
  * Expectations staple): declared row-level rules evaluated in ONE
  * aggregate pass over the table, plus a separate uniqueness check
  * (inherently non-row-local).
  *
  * Scale: `evaluate` is a single scan + single hash aggregate however
  * many rules are declared — each rule is a conditional-sum column
  * riding the same pass, so adding rules costs columns, not scans. The
  * per-rule report is exploded from the 1-row aggregate, so the shuffle
  * carries |rules| rows.
  */
object Expectations {

  /** A named row-level rule: `holds` must evaluate to boolean per row
    * (null counts as a violation — SQL three-valued logic would
    * otherwise silently pass null rows). */
  final case class Rule(name: String, holds: Column)

  /** One row per rule: (expectation, n_rows, n_failed, fail_rate 4-dp,
    * passed). A row fails a rule when the predicate is false OR null. */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "evaluate needs at least one rule")
    val agg = df.agg(
      count(lit(1)).as("n_rows"),
      array(rules.map(r => struct(
        lit(r.name).as("expectation"),
        sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L))
          .as("n_failed"))): _*).as("__rules"))
    agg.select(col("n_rows"), explode(col("__rules")).as("__r"))
      .select(col("__r.expectation").as("expectation"), col("n_rows"),
        coalesce(col("__r.n_failed"), lit(0L)).as("n_failed"))
      .withColumn("fail_rate",
        round(when(col("n_rows") > 0,
          col("n_failed") / col("n_rows").cast("double"))
          .otherwise(lit(0.0)), 4))
      .withColumn("passed", col("n_failed") === 0L)
  }

  /** Uniqueness expectation on a key: (expectation, n_rows, n_failed,
    * fail_rate, passed) where n_failed counts rows IN EXCESS of one per
    * key (so a fully-unique key fails 0). One hash aggregate on the key
    * + one tiny roll-up. */
  def uniqueness(df: DataFrame, keyCols: Seq[String],
                 name: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).cast("long").as("n_rows"),
        sum(col("__c") - 1L).cast("long").as("n_failed"))
      .select(lit(name).as("expectation"), col("n_rows"),
        coalesce(col("n_failed"), lit(0L)).as("n_failed"))
      .withColumn("fail_rate",
        round(when(col("n_rows") > 0,
          col("n_failed") / col("n_rows").cast("double"))
          .otherwise(lit(0.0)), 4))
      .withColumn("passed", col("n_failed") === 0L)
}
