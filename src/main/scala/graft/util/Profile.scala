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
    * Scale shape: a SINGLE aggregate pass — Spark plans the n exact
    * `count(DISTINCT col)`s as one Expand (n-way row replication) into
    * one hash aggregate, so the table is scanned once; the expansion
    * factor equals the profiled column count, which is the price of
    * EXACT cardinalities in one job (trim `cols`, or swap in
    * approx_count_distinct upstream, when n x rows is too hot). The
    * per-column output assembles driver-side from that one aggregate
    * row — bounded by column count, never data.
    *
    * Output: (column, n_rows, n_null, n_distinct, min_num, max_num,
    * min_str, max_str) in `cols` order.
    */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val types = names.map(c => c -> df.schema(c).dataType).toMap
    val aggs = names.flatMap { c =>
      val base = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
      types(c) match {
        case _: NumericType => base ++ Seq(
          round(min(col(c)).cast("double"), 4).as(s"__min_$c"),
          round(max(col(c)).cast("double"), 4).as(s"__max_$c"))
        case StringType => base ++ Seq(
          min(col(c)).as(s"__smin_$c"), max(col(c)).as(s"__smax_$c"))
        case _ => base
      }
    } :+ count(lit(1)).as("__rows")
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    def opt[T](name: String): Option[T] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.get(i).asInstanceOf[T])
    }
    val spark = df.sparkSession
    import spark.implicits._
    names.map { c =>
      val (minN, maxN) = types(c) match {
        case _: NumericType =>
          (opt[Double](s"__min_$c"), opt[Double](s"__max_$c"))
        case _ => (None, None)
      }
      val (minS, maxS) = types(c) match {
        case StringType =>
          (opt[String](s"__smin_$c"), opt[String](s"__smax_$c"))
        case _ => (None, None)
      }
      (c, r.getAs[Long]("__rows"), r.getAs[Long](s"__null_$c"),
        r.getAs[Long](s"__dist_$c"), minN, maxN, minS, maxS)
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
