package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed closed-form regression beyond the univariate
  * [[RankStats.groupedOls]]: two-regressor OLS via the normal
  * equations. The whole fit is ONE map-side-combinable aggregate of
  * ten sufficient statistics (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂,
  * Σx₁y, Σx₂y, Σy²) followed by a 2×2 Cramer solve on the driver-free
  * single result row — the textbook "ML on 100 TB without a single
  * collect" shape (same statistics a parameter server would
  * accumulate).
  */
object Regression {

  /** Fit y = b0 + b1·x1 + b2·x2. Output (one row): n, b0, b1, b2 (all
    * 4dp), r2 (4dp). Null coefficients when the design is singular
    * (det = 0, e.g. collinear regressors) — never a division error.
    */
  def ols2(df: DataFrame, y: String, x1: String, x2: String): DataFrame = {
    val yv = col(y).cast("double")
    val v1 = col(x1).cast("double")
    val v2 = col(x2).cast("double")
    val a = df
      .filter(yv.isNotNull && v1.isNotNull && v2.isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(v1).as("s1"), sum(v2).as("s2"), sum(yv).as("sy"),
        sum(v1 * v1).as("s11"), sum(v2 * v2).as("s22"),
        sum(v1 * v2).as("s12"),
        sum(v1 * yv).as("s1y"), sum(v2 * yv).as("s2y"),
        sum(yv * yv).as("syy"))
    val n = col("n").cast("double")
    val c11 = col("s11") - col("s1") * col("s1") / n
    val c22 = col("s22") - col("s2") * col("s2") / n
    val c12 = col("s12") - col("s1") * col("s2") / n
    val c1y = col("s1y") - col("s1") * col("sy") / n
    val c2y = col("s2y") - col("s2") * col("sy") / n
    val cyy = col("syy") - col("sy") * col("sy") / n
    val det = nullif(c11 * c22 - c12 * c12, lit(0.0))
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c2y * c11 - c1y * c12) / det
    val b0 = (col("sy") - b1 * col("s1") - b2 * col("s2")) / n
    val r2 = (b1 * c1y + b2 * c2y) / nullif(cyy, lit(0.0))
    a.select(col("n"),
      round(b0, 4).as("b0"), round(b1, 4).as("b1"),
      round(b2, 4).as("b2"), round(r2, 4).as("r2"))
  }
}
