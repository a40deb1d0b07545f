package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.de.Stats

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's core analytic shape (differential expression,
    * `pipeline2.py:540-648`) transplanted onto the test star schema: per
    * part-type Welch t-test of l_extendedprice between returnflag groups,
    * BH-adjusted, top 20 most significant. Exercises broadcast join, hash
    * agg with conditional pivots, the custom t-CDF expression, the BH
    * window, and top-k — rows > 0 guaranteed by limit-not-filter.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(broadcast(spark.read.parquet(s"$dir/part.parquet")),
        $"l_partkey" === $"p_partkey")
      .select($"p_type", $"l_returnflag".as("grp"), $"l_extendedprice".as("v"))
    val tested = Stats.welchTTest(li, Seq("p_type"), "grp", "v",
      caseVal = "A", controlVal = "N")
    Stats.bhAdjust(tested, "pvalue", "adjusted_pvalue", tieBreak = Seq("p_type"))
      .orderBy($"adjusted_pvalue".asc_nulls_last, $"p_type")
      .limit(20)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
