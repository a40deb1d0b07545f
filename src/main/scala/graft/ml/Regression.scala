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

  /** First-order partial correlation r_xy·z = (r_xy − r_xz·r_zy) /
    * √((1−r_xz²)(1−r_zy²)) — the "does x still correlate with y once z
    * is held fixed" readout, from the same one-aggregate sufficient
    * statistics as [[ols2]]. Output (one row): n, r_xy, r_xz, r_yz,
    * r_xy_z (all 4dp; null when any marginal correlation is
    * degenerate).
    */
  def partialCorr(df: DataFrame, x: String, y: String,
                  z: String): DataFrame = {
    val xv = col(x).cast("double")
    val yv = col(y).cast("double")
    val zv = col(z).cast("double")
    val a = df
      .filter(xv.isNotNull && yv.isNotNull && zv.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(xv).as("sx"), sum(yv).as("sy"), sum(zv).as("sz"),
        sum(xv * xv).as("sxx"), sum(yv * yv).as("syy"),
        sum(zv * zv).as("szz"), sum(xv * yv).as("sxy"),
        sum(xv * zv).as("sxz"), sum(yv * zv).as("syz"))
    val n = col("n").cast("double")
    def cov(spq: String, sp: String, sq: String) =
      col(spq) - col(sp) * col(sq) / n
    val vx = cov("sxx", "sx", "sx")
    val vy = cov("syy", "sy", "sy")
    val vz = cov("szz", "sz", "sz")
    val rxy = cov("sxy", "sx", "sy") / nullif(sqrt(vx * vy), lit(0.0))
    val rxz = cov("sxz", "sx", "sz") / nullif(sqrt(vx * vz), lit(0.0))
    val ryz = cov("syz", "sy", "sz") / nullif(sqrt(vy * vz), lit(0.0))
    val part = (rxy - rxz * ryz) /
      nullif(sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)),
        lit(0.0))
    a.select(col("n"),
      round(rxy, 4).as("r_xy"), round(rxz, 4).as("r_xz"),
      round(ryz, 4).as("r_yz"), round(part, 4).as("r_xy_z"))
  }
}
