package graft.privacy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy thresholding for data release — the structural companion to
  * content-level PII scrubbing (q48's regex pass): scrubbing cleans
  * WHAT a row says, suppression controls WHETHER a row is releasable at
  * all. k-anonymity's suppression step (Sweeney 2002): a row is safe
  * only if at least k rows share its full quasi-identifier combination
  * (the columns an adversary could link on — zip, segment, nation…);
  * rarer combinations are dropped.
  *
  * Scale shape: one hash aggregate on the quasi-identifier key for the
  * group sizes, joined back co-partitioned on that same key (the
  * group-size side is combination-cardinality; AQE broadcasts it when
  * small). No window, no global sort; the fact rows are scanned once.
  */
object Privacy {

  /** Rows whose quasi-identifier combination has >= k members; all
    * other rows suppressed. Null counts as a value (an all-null
    * combination shared by k rows survives — nulls are linkable too). */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(!df.columns.contains("__gn"),
      "input must not contain a __gn column")
    kAnonymizeAgainst(df, groupSizes(df, quasiCols), quasiCols, k)
  }

  /** Group sizes for [[kAnonymizeAgainst]] — exposed so a caller can
    * persist the snapshot (the accumulated release population) and
    * filter later/streaming data against it. */
  def groupSizes(df: DataFrame, quasiCols: Seq[String]): DataFrame =
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__gn"))

  /** The suppression filter against a PRECOMPUTED sizes table
    * ((quasiCols…, __gn) — [[groupSizes]]' shape). This is also the
    * STREAMING form: with a streaming `df` and a batch-maintained sizes
    * snapshot, the stream-static join is stateless per micro-batch and
    * the static side is re-read each batch, so a refreshed snapshot is
    * picked up without restart (the incrementalDedupStream pattern) —
    * rows whose combination hasn't reached k in the released population
    * are held back. */
  def kAnonymizeAgainst(df: DataFrame, sizes: DataFrame,
                        quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 1, "k must be >= 1")
    require(!df.columns.contains("__gn"),
      "input must not contain a __gn column")
    // null-safe join: co-null rows shield each other (see Joins scaladoc)
    graft.util.Joins.nullSafeStatsJoin(df, sizes, quasiCols)
      .filter(col("__gn") >= k)
      .drop("__gn")
  }

  /** ε-differentially-private count release via the Laplace mechanism
    * (Dwork et al. 2006): released = count + Lap(Δ/ε), Δ = 1 for
    * counting queries. The noise draw inverts the Laplace CDF at a
    * DETERMINISTIC md5-derived uniform seeded per group key — the
    * mechanism is exact DP math; injecting the seed makes releases
    * replayable and cross-engine testable (production swaps in a CSPRNG
    * at the same seam; the seed column IS that seam). u ∈ [−½, ½) from
    * 47 md5 bits; noise = −(Δ/ε)·sgn(u)·ln(1−2|u|), the ln argument
    * clamped at 1e−12 so the u = −½ grid edge can't produce −∞.
    * Output per group: (group, true_count, noise 4dp, released 4dp,
    * epsilon). true_count and noise are AUDIT-ONLY columns for the
    * data-owner side of the pipeline — publishing them alongside
    * released would disclose the exact counts and void the DP
    * guarantee; the publishable frame is [[dpRelease]] (group,
    * released, epsilon) only.
    */
  def dpCounts(df: DataFrame, group: String, epsilon: Double,
               seedSalt: String): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    import graft.functions.gfunctions.md5_long
    val mask = (1L << 47) - 1
    val b = 1.0 / epsilon
    val u0 = md5_long(concat(lit(seedSalt), lit(":"),
      col(group).cast("string")))
      .bitwiseAND(lit(mask)).cast("double") / lit(mask.toDouble)
    val u = u0 - 0.5
    val noise = -lit(b) * signum(u) *
      log(greatest(lit(1.0) - lit(2.0) * abs(u), lit(1e-12)))
    df.groupBy(col(group))
      .agg(count(lit(1)).as("true_count"))
      .select(col(group), col("true_count"),
        round(noise, 4).as("noise"),
        round(col("true_count") + noise, 4).as("released"),
        lit(epsilon).as("epsilon"))
  }

  /** The publishable projection of [[dpCounts]]: only (group,
    * released, epsilon) leave the trust boundary — the noised value
    * carries the full ε-DP guarantee; the audit columns never do.
    */
  def dpRelease(df: DataFrame, group: String, epsilon: Double,
                seedSalt: String): DataFrame =
    dpCounts(df, group, epsilon, seedSalt)
      .select(col(group), col("released"), col("epsilon"))

  /** l-diversity audit: per quasi-identifier equivalence class, the
    * class size and the number of DISTINCT sensitive values (the l of
    * that class). k-anonymity alone leaves a class of k rows that all
    * share one sensitive value fully disclosed (the homogeneity
    * attack, Machanavajjhala et al. 2007); a release is l-diverse iff
    * min over classes of distinct-sensitive ≥ l. Output per class:
    * (quasiCols…, class_size, l_distinct, diverse = l_distinct ≥ l),
    * plus min_l repeated via a window over the class-bounded table so
    * the release-level verdict rides along. One aggregate over facts;
    * the window runs over classes, never rows.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(l >= 1, "l must be >= 1")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    classes.select((quasiCols.map(col) ++ Seq(col("class_size"),
      col("l_distinct"), (col("l_distinct") >= l).as("diverse"),
      min(col("l_distinct")).over(w).as("min_l"))): _*)
  }

  /** The release report a privacy review actually reads: per k in
    * `ks`, how many quasi-identifier combinations and rows survive a
    * >= k gate, and the suppressed-row fraction. One group-size
    * aggregate feeds every k (the sizes table is re-aggregated, not the
    * fact), so the sweep costs one extra combination-cardinality pass
    * per k. */
  def suppressionReport(df: DataFrame, quasiCols: Seq[String],
                        ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be >= 1")
    val sizes = groupSizes(df, quasiCols)
    val total = sizes.agg(sum(col("__gn")).as("__rows"))
    val perK = ks.map { k =>
      sizes.filter(col("__gn") >= k)
        .agg(lit(k).as("k"),
          count(lit(1)).as("n_groups_kept"),
          coalesce(sum(col("__gn")), lit(0L)).as("n_rows_kept"))
    }.reduce(_ unionByName _)
    perK.crossJoin(broadcast(total))
      .select(col("k"), col("n_groups_kept"), col("n_rows_kept"),
        round(lit(1.0) - col("n_rows_kept").cast("double") /
          col("__rows").cast("double"), 4).as("suppressed_frac"))
      .orderBy(col("k"))
  }
}
