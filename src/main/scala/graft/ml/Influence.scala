package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-level data valuation by leave-one-out refits WITHOUT refits:
  * OLS sufficient statistics are additive, so per-source (X'X, X'y)
  * partials subtract from the corpus totals to give every
  * leave-one-source-out model in closed form — the datamodels/DataInf
  * question ("which slice of my training mix moves the model, and
  * which way?") answered with one aggregate pass over the facts plus
  * arithmetic on a source-bounded table. No per-source refit jobs, no
  * driver loop: |sources| LOO fits cost the same as one.
  *
  * Scale: ONE map-side-combined hash aggregate over the fact table
  * (shuffle ∝ |sources| × 10 doubles), a 1-row totals frame broadcast
  * back (the allow-listed literal-bounded NLJ shape), then pure
  * column arithmetic at source grain. 100 TB in, |sources| rows out.
  *
  * Determinism contract: pass INTEGER-VALUED y/x columns (counts,
  * cents, hours) so the partial sums are exact in IEEE doubles and the
  * closed-form solve is bit-identical across engines and partition
  * orders — the exact-integer-units discipline used catalog-wide.
  */
object Influence {

  /** Per-source leave-one-out influence on the 2-feature OLS
    * y ~ b0 + b1·x1 + b2·x2. Output, one row per source:
    * (source, n_source, b1_full, b1_loo, b1_delta, r2_full, r2_loo,
    * r2_delta) — deltas signed as (loo − full): a positive r2_delta
    * means the model fits BETTER without the source (the source is
    * hurting fit); b1_delta shows how the source bends the slope. */
  def looSourceOls2(df: DataFrame, source: String, y: String,
                    x1: String, x2: String, roundDp: Int = 4): DataFrame = {
    val d = df.select(col(source).as("__s"),
        col(y).cast("double").as("__y"),
        col(x1).cast("double").as("__x1"),
        col(x2).cast("double").as("__x2"))
      .filter(col("__y").isNotNull && col("__x1").isNotNull &&
        col("__x2").isNotNull)
    def stats(prefix: String): Seq[Column] = Seq(
      count(lit(1)).cast("double").as(s"${prefix}n"),
      sum(col("__x1")).as(s"${prefix}s1"),
      sum(col("__x2")).as(s"${prefix}s2"),
      sum(col("__y")).as(s"${prefix}sy"),
      sum(col("__x1") * col("__x1")).as(s"${prefix}s11"),
      sum(col("__x2") * col("__x2")).as(s"${prefix}s22"),
      sum(col("__x1") * col("__x2")).as(s"${prefix}s12"),
      sum(col("__x1") * col("__y")).as(s"${prefix}s1y"),
      sum(col("__x2") * col("__y")).as(s"${prefix}s2y"),
      sum(col("__y") * col("__y")).as(s"${prefix}syy"))
    val perSource = d.groupBy(col("__s")).agg(stats("g_").head,
      stats("g_").tail: _*)
    val totals = d.agg(stats("t_").head, stats("t_").tail: _*)
    // (b1, r2) of the model fit on the given sufficient statistics —
    // the q224 closed form, written ONCE and applied to both the full
    // totals and each subtracted LOO row so the expression order (and
    // therefore the IEEE result) is identical everywhere
    def fit(n: Column, s1: Column, s2: Column, sy: Column, s11: Column,
            s22: Column, s12: Column, s1y: Column, s2y: Column,
            syy: Column): (Column, Column) = {
      val c11 = s11 - s1 * s1 / n
      val c22 = s22 - s2 * s2 / n
      val c12 = s12 - s1 * s2 / n
      val c1y = s1y - s1 * sy / n
      val c2y = s2y - s2 * sy / n
      val cyy = syy - sy * sy / n
      val det = c11 * c22 - c12 * c12
      val b1 = when(det =!= 0.0, (c1y * c22 - c2y * c12) / det)
      val b2 = when(det =!= 0.0, (c2y * c11 - c1y * c12) / det)
      val r2 = when(cyy =!= 0.0, (b1 * c1y + b2 * c2y) / cyy)
      (b1, r2)
    }
    val j = perSource.crossJoin(broadcast(totals))
    def lo(g: String, t: String): Column = col(t) - col(g)
    val (b1Full, r2Full) = fit(col("t_n"), col("t_s1"), col("t_s2"),
      col("t_sy"), col("t_s11"), col("t_s22"), col("t_s12"),
      col("t_s1y"), col("t_s2y"), col("t_syy"))
    val (b1Loo, r2Loo) = fit(
      lo("g_n", "t_n"), lo("g_s1", "t_s1"), lo("g_s2", "t_s2"),
      lo("g_sy", "t_sy"), lo("g_s11", "t_s11"), lo("g_s22", "t_s22"),
      lo("g_s12", "t_s12"), lo("g_s1y", "t_s1y"), lo("g_s2y", "t_s2y"),
      lo("g_syy", "t_syy"))
    j.select(col("__s").as("source"),
      col("g_n").cast("long").as("n_source"),
      round(b1Full, roundDp).as("b1_full"),
      round(b1Loo, roundDp).as("b1_loo"),
      round(b1Loo - b1Full, roundDp).as("b1_delta"),
      round(r2Full, roundDp).as("r2_full"),
      round(r2Loo, roundDp).as("r2_loo"),
      round(r2Loo - r2Full, roundDp).as("r2_delta"))
  }
}
