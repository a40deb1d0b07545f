package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based statistics: Spearman correlation and lag-k autocorrelation
  * (stats extensions beyond the reference's A-family; the reference
  * computes only Pearson — `pipeline2.py:702-703` — but rank and serial
  * correlation are standard companions for skewed analytics data).
  *
  * Spearman ρ = Pearson correlation of the two columns' average ranks
  * (ties receive the mean of the row numbers they span — the "fractional
  * rank" convention both SciPy and SQL engines implement). Average ranks
  * are deterministic even though `row_number` breaks ties arbitrarily:
  * the SUM of row numbers over a tie group is fixed, so its mean is too.
  *
  * Plan shape per group: two rank windows (one per column — each a sort
  * within the group partition), one tie-average window keyed by
  * (group, value), then a single `corr` hash aggregate. Everything is
  * partitioned by the group key — no global sort, no driver state, and
  * group cardinality bounds the aggregate output. At 100 TB the cost is
  * the two per-group sorts, the unavoidable core of any exact rank
  * statistic; the shuffles all reuse the group-key partitioning.
  */
object RankStats {

  /** Per-group Spearman rank correlation of `x` vs `y`:
    * (groupCols*, n BIGINT, spearman = round(ρ, 4)). Groups with fewer
    * than 2 rows or zero rank variance yield null ρ (undefined).
    * Complete-case: rows with null `x` OR null `y` are dropped before
    * ranking and excluded from `n` — a null would otherwise shift
    * every other row's rank, and shift DIFFERENTLY per engine (Spark
    * sorts nulls first, DuckDB last; divergence found by the round-11
    * differential fuzz on null-injected data). */
  def spearman(df: DataFrame, groupCol: String, x: String,
               y: String): DataFrame = {
    val rnX = Window.partitionBy(col(groupCol)).orderBy(col(x))
    val rnY = Window.partitionBy(col(groupCol)).orderBy(col(y))
    val tieX = Window.partitionBy(col(groupCol), col(x))
    val tieY = Window.partitionBy(col(groupCol), col(y))
    df.select(col(groupCol), col(x), col(y))
      .filter(col(x).isNotNull && col(y).isNotNull)
      .withColumn("__rx0", row_number().over(rnX))
      .withColumn("__ry0", row_number().over(rnY))
      .withColumn("__rx", avg(col("__rx0")).over(tieX))
      .withColumn("__ry", avg(col("__ry0")).over(tieY))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(corr(col("__rx"), col("__ry")), 4).as("spearman"))
  }

  /** Lag-k autocorrelation of a per-key ordered series: for each key and
    * each lag in `lags`, the sample Pearson correlation of (x_t, x_{t−k})
    * over the t where both exist — the direct paired-corr estimator.
    * `orderCol` must be unique per key (a time bucket). Output:
    * (key, lag INT, n BIGINT, acf = round(corr, 4)).
    *
    * One lag window per requested k over the SAME (key, order) sort —
    * Catalyst collapses same-spec windows into a single Window operator,
    * so the series is sorted once regardless of how many lags are asked
    * for; the stack+filter then feeds one hash aggregate keyed
    * (key, lag). */
  def autocorr(series: DataFrame, key: String, orderCol: String,
               value: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), "lags must be >= 1")
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    val lagged = lags.foldLeft(series.select(col(key), col(orderCol),
      col(value).cast("double").as("__x"))) { (d, k) =>
      d.withColumn(s"__l$k", lag(col("__x"), k).over(w))
    }
    val pairs = lagged.select(col(key), col("__x"),
      stack((lit(lags.length) +:
        lags.flatMap(k => Seq(lit(k), col(s"__l$k")))): _*)
        .as(Seq("lag", "__xl")))
      .filter(col("__xl").isNotNull)
    pairs.groupBy(col(key), col("lag"))
      .agg(count(lit(1)).as("n"),
        round(corr(col("__x"), col("__xl")), 4).as("acf"))
  }

  /** Kendall's τ-b per group — the concordance-based rank correlation
    * with FULL tie correction: τ_b = (C − D) / √((n₀ − n₁)(n₀ − n₂)),
    * n₀ = n(n−1)/2, n₁/n₂ = Σ t(t−1)/2 over x/y tie groups. More
    * robust than Spearman to a few wild ranks and the one reviewers
    * ask for on heavily tied ordinal data. Inherently pairwise (the
    * TrendStats contract: per-group O(n²) pairs over BOUNDED groups —
    * facts must be pre-aggregated to the group grain). Every count is
    * an exact integer; the single division happens once. Output:
    * (group, n BIGINT, n_concordant BIGINT, n_discordant BIGINT,
    * tau_b 4dp — null when either axis is all ties). */
  def kendallTauB(df: DataFrame, groupCol: String, x: String,
                  y: String): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
      col(x).cast("double").as("__x"), col(y).cast("double").as("__y"))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__x"), col("__y"))
    val rows = base.withColumn("__i", row_number().over(w))
    val a = rows.select(col("__g"), col("__i").as("__ia"),
      col("__x").as("__xa"), col("__y").as("__ya"))
    val b = rows.select(col("__g"), col("__i").as("__ib"),
      col("__x").as("__xb"), col("__y").as("__yb"))
    val pairs = a.join(b, Seq("__g")).filter(col("__ia") < col("__ib"))
    val sgn = signum(col("__xb") - col("__xa")) *
      signum(col("__yb") - col("__ya"))
    val agg = pairs.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n0"),
        count(when(sgn > 0, 1)).as("n_concordant"),
        count(when(sgn < 0, 1)).as("n_discordant"),
        count(when(col("__xa") === col("__xb"), 1)).as("__tx"),
        count(when(col("__ya") === col("__yb"), 1)).as("__ty"))
    val nPts = base.groupBy(col("__g")).agg(count(lit(1)).as("n"))
    val denom = sqrt((col("__n0") - col("__tx")).cast("double") *
      (col("__n0") - col("__ty")))
    agg.join(nPts, Seq("__g"))
      .select(col("__g").as(groupCol), col("n"), col("n_concordant"),
        col("n_discordant"),
        round((col("n_concordant") - col("n_discordant")).cast("double")
          / nullif(denom, lit(0.0)), 4).as("tau_b"))
  }
}
