package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Method-agreement statistics: Bland–Altman limits of agreement for
  * two continuous measurements of the same units ("can method B
  * replace method A" — the question a correlation coefficient
  * famously CANNOT answer, Bland & Altman 1986), and the one-way
  * intraclass correlation ICC(1,1) for "how much of the variance is
  * between subjects vs noise" over repeated ratings — the continuous
  * sibling of Cohen's kappa (q202) and Cronbach's alpha (q229).
  * Both are one or two hash aggregates of sufficient statistics.
  */
object Agreement {

  /** Bland–Altman per group over paired columns: d = b − a,
    * LoA = mean(d) ± 1.96·sd(d) (sample sd), plus the share of pairs
    * outside the limits (≈ 5% when differences are normal — a
    * built-in sanity readout). Output: (group, n BIGINT, bias 4dp,
    * sd_diff 4dp, loa_lo 4dp, loa_hi 4dp, pct_outside 4dp); groups
    * with n < 2 yield null limits. */
  def blandAltman(df: DataFrame, groupCol: String, aCol: String,
                  bCol: String): DataFrame = {
    val d = col(bCol).cast("double") - col(aCol).cast("double")
    val base = df.filter(d.isNotNull)
      .select(col(groupCol).as("__g"), d.as("__d"))
    val stats = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), avg(col("__d")).as("__m"),
        stddev_samp(col("__d")).as("__sd"))
    val lo = col("__m") - lit(1.959964) * col("__sd")
    val hi = col("__m") + lit(1.959964) * col("__sd")
    base.join(broadcast(stats), Seq("__g"))
      .groupBy(col("__g"))
      .agg(max(col("n")).as("n"), max(col("__m")).as("__m"),
        max(col("__sd")).as("__sd"),
        avg(when(col("__d") < lo || col("__d") > hi, 1.0)
          .otherwise(0.0)).as("__out"))
      .select(col("__g").as(groupCol), col("n"),
        round(col("__m"), 4).as("bias"),
        round(col("__sd"), 4).as("sd_diff"),
        round(col("__m") - lit(1.959964) * col("__sd"), 4)
          .as("loa_lo"),
        round(col("__m") + lit(1.959964) * col("__sd"), 4)
          .as("loa_hi"),
        round(col("__out"), 4).as("pct_outside"))
  }

  /** One-way random-effects ICC(1,1) over long (subject, rating)
    * rows: from the one-way ANOVA decomposition, MSB = between-
    * subject mean square, MSW = within, k₀ = (Σk − Σk²/Σk)/(n−1)
    * the unbalanced-design effective group size, ICC = (MSB − MSW) /
    * (MSB + (k₀−1)·MSW). Subjects with a single rating contribute to
    * MSB only (standard). Output (one row): (n_subjects BIGINT,
    * n_ratings BIGINT, k0 4dp, msb 4dp, msw 4dp, icc 4dp);
    * degenerate designs yield nulls. */
  def iccOneWay(df: DataFrame, subject: String,
                value: String): DataFrame = {
    val v = col(value).cast("double")
    val per = df.filter(v.isNotNull)
      .groupBy(col(subject).as("__s"))
      .agg(count(lit(1)).as("__k"), sum(v).as("__sv"),
        sum(v * v).as("__sv2"))
    val agg = per.agg(count(lit(1)).as("n_subjects"),
      sum(col("__k")).as("n_ratings"),
      sum(col("__k") * col("__k")).as("__k2"),
      sum(col("__sv")).as("__tot"),
      sum(col("__sv2")).as("__tot2"),
      sum(col("__sv") * col("__sv") / col("__k")).as("__ssb"))
    val n = col("n_subjects").cast("double")
    val bigN = col("n_ratings").cast("double")
    val k0 = (bigN - col("__k2") / bigN) / nullif(n - 1, lit(0.0))
    val ssb = col("__ssb") - col("__tot") * col("__tot") / bigN
    val ssw = col("__tot2") - col("__ssb")
    val msb = ssb / nullif(n - 1, lit(0.0))
    val msw = ssw / nullif(bigN - n, lit(0.0))
    agg.select(col("n_subjects"), col("n_ratings"),
      round(k0, 4).as("k0"),
      round(msb, 4).as("msb"),
      round(msw, 4).as("msw"),
      round((msb - msw) / nullif(msb + (k0 - 1) * msw, lit(0.0)), 4)
        .as("icc"))
  }
}
