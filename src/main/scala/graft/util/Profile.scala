package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Schema/data profiling: the per-column quality report (null fraction,
  * exact distinct cardinality, ranges) a pipeline runs before trusting a
  * new drop of data — Deequ/Great-Expectations territory, expressed as
  * one declarative aggregate.
  */
object Profile {

  /** One row per profiled column: row count, null count, exact distinct
    * count, and min/max — numeric ranges in `min_num`/`max_num`
    * (4-dp-rounded doubles), string ranges in `min_str`/`max_str`, the
    * other pair null. Unsupported types (structs, arrays, binary)
    * profile counts only.
    *
    * Scale shape: one job whose plan is a UNION of per-column aggregate
    * branches. The previous fused form planned the n exact
    * `count(DISTINCT col)`s as ONE (n+1)-way Expand into one hash
    * aggregate — the whole table replicated n+1× through a single
    * reduce path (and, on a single-split input, a single task);
    * as independent union branches the per-column scans and aggregates
    * run CONCURRENTLY inside one job, and a single-distinct aggregate
    * plans as a plain two-phase agg with no Expand at all. Aggregate
    * expressions per column are unchanged, so the values are
    * identical. The per-column output assembles driver-side from the
    * n collected branch rows — bounded by column count, never data.
    *
    * Output: (column, n_rows, n_null, n_distinct, min_num, max_num,
    * min_str, max_str) in `cols` order.
    */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val types = names.map(c => c -> df.schema(c).dataType).toMap
    val nullD = max(lit(null).cast("double"))
    val nullS = max(lit(null).cast("string"))
    val branches = names.map { c =>
      val (minN, maxN, minS, maxS) = types(c) match {
        case _: NumericType => (
          round(min(col(c)).cast("double"), 4), // same exprs as before
          round(max(col(c)).cast("double"), 4), nullS, nullS)
        case StringType => (nullD, nullD, min(col(c)), max(col(c)))
        case _ => (nullD, nullD, nullS, nullS)
      }
      df.agg(count(lit(1)).as("__rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("__null"),
          countDistinct(col(c)).as("__dist"),
          minN.as("__minn"), maxN.as("__maxn"),
          minS.as("__mins"), maxS.as("__maxs"))
        .select(lit(c).as("column"), col("__rows"), col("__null"),
          col("__dist"), col("__minn"), col("__maxn"), col("__mins"),
          col("__maxs"))
    }
    // union row order = branch order = `names` order (union concatenates)
    val rows = branches.reduce(_ unionByName _).collect()
    val spark = df.sparkSession
    import spark.implicits._
    rows.toSeq.map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getString(6)),
        if (r.isNullAt(7)) None else Some(r.getString(7)))
    }.toDF("column", "n_rows", "n_null", "n_distinct",
      "min_num", "max_num", "min_str", "max_str")
  }

  /** Equi-width histogram of an INTEGRAL column, exact across engines:
    * bin = floor((v − min)·bins / (max − min + 1)), all terms integral
    * so the double quotient is exact for |(v − min)·bins| < 2^53 (any
    * money-in-cents or epoch-axis column fits) — no float-boundary bin
    * flapping. The +1 on the span puts max in the last bin without a
    * branch. Empty bins are absent (count them dense by left-joining a
    * range if needed).
    *
    * Plan: one min/max aggregate broadcast back as a 1-row crossJoin
    * (the A14 pattern — no single-partition window), then one grouped
    * count; two scans of the value column, both pruned to it.
    * Output: (bin BIGINT, n BIGINT, lo, hi = observed bin bounds),
    * ordered by bin. */
  def equiWidthHistogram(df: DataFrame, value: String,
                         bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val v = df.select(col(value).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val stats = v.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    v.crossJoin(broadcast(stats))
      .select(floor((col("__v") - col("__lo")) * lit(bins.toLong) /
        (col("__hi") - col("__lo") + lit(1L))).cast("long").as("bin"),
        col("__v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
      .orderBy(col("bin"))
  }

  /** Benford first-digit conformance screen — the forensic-accounting
    * test: natural multi-magnitude positive quantities (amounts,
    * populations) put digit d first with probability log10(1 + 1/d);
    * fabricated or constrained data deviates. Output per digit 1–9:
    * observed count, observed share (6-dp), the Benford expectation
    * (6-dp), and the signed deviation (6-dp).
    *
    * The first digit is extracted WITHOUT float log arithmetic — the
    * value is rendered by `format_number(v, 0)`-free integer casting:
    * cast to a plain decimal string and take the first digit character
    * — so boundary values like 999.9999 can never flap between 9 and 1
    * across engines. Non-positive and null values are excluded (Benford
    * applies to positive quantities). One filtered projection + one
    * 9-row aggregate + a windowed total over those 9 rows. */
  /** Functional-dependency check lhs → rhs: per lhs value, does
    * exactly one rhs value appear? Output (one row): n_keys,
    * n_violating_keys (lhs values with > 1 distinct rhs),
    * n_violating_rows (rows under those keys beyond the majority rhs —
    * the minimum repairs to make the FD hold), holds. The profiling
    * primitive behind schema-inference and join-key audits; one
    * (lhs, rhs) aggregate then lhs-grain roll-ups, never a fact-grain
    * second pass. Nulls in lhs or rhs are excluded (SQL FD convention).
    */
  def fdCheck(df: DataFrame, lhs: String, rhs: String): DataFrame = {
    val cells = df
      .filter(col(lhs).isNotNull && col(rhs).isNotNull)
      .groupBy(col(lhs).as("__l"), col(rhs).as("__r"))
      .agg(count(lit(1)).as("__n"))
    cells.groupBy(col("__l"))
      .agg(count(lit(1)).as("__nrhs"), sum(col("__n")).as("__rows"),
        max(col("__n")).as("__maj"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("__nrhs") > 1, 1L).otherwise(0L))
          .as("n_violating_keys"),
        sum(when(col("__nrhs") > 1, col("__rows") - col("__maj"))
          .otherwise(0L)).as("n_violating_rows"))
      .withColumn("holds", col("n_violating_keys") === 0)
  }

  def benfordFirstDigit(df: DataFrame, value: String): DataFrame = {
    val digit = substring(regexp_replace(
      col(value).cast("decimal(38,6)").cast("string"), "[^1-9]", ""),
      1, 1).cast("int")
    val counts = df
      .filter(col(value).isNotNull && col(value) > 0)
      .select(digit.as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val total = sum(col("n"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    counts
      .withColumn("share",
        round(col("n").cast("double") / total, 6))
      .withColumn("benford_p",
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("deviation", round(col("share") - col("benford_p"), 6))
      .orderBy(col("digit"))
  }
}
