package graft.de

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical dependence via Shannon information: entropies of two
  * discrete columns, their joint entropy, mutual information, and
  * normalized MI — the model-free "are these features redundant"
  * screen used in feature selection and leakage audits, and the
  * continuous-free companion to the chi-square independence statistic
  * ([[RankStats]]).
  *
  * Everything reduces over the JOINT CELL TABLE (one row per distinct
  * (x, y) pair — bounded by the category-domain product, never the fact
  * table): H(X) and H(Y) come from marginal sums over the same cells,
  * so the fact table is scanned once into one hash aggregate. Identity
  * used throughout: H = ln N − (Σ c·ln c)/N with exact BIGINT counts,
  * so the only float work is c·ln c terms whose accumulation noise
  * (~1e-12) is far inside the 6-dp round. MI = H(X)+H(Y)−H(XY) is
  * computed from the UNROUNDED entropies, then rounded once.
  */
object InfoTheory {

  /** One row: (n BIGINT, n_cells BIGINT, h_x, h_y, h_xy, mi, nmi — all
    * 6 dp; nmi null for a degenerate axis with zero entropy). */
  def mutualInformation(df: DataFrame, xCol: String,
                        yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
    val mx = cells.groupBy(col("x")).agg(sum(col("c")).as("cx"))
    val my = cells.groupBy(col("y")).agg(sum(col("c")).as("cy"))
    val agg = cells.agg(
      sum(col("c")).as("n"),
      count(lit(1)).as("n_cells"),
      sum(col("c").cast("double") * log(col("c").cast("double")))
        .as("clc_xy"))
    val aggX = mx.agg(sum(col("cx").cast("double") *
      log(col("cx").cast("double"))).as("clc_x"))
    val aggY = my.agg(sum(col("cy").cast("double") *
      log(col("cy").cast("double"))).as("clc_y"))
    val hx = log(col("n").cast("double")) - col("clc_x") / col("n")
    val hy = log(col("n").cast("double")) - col("clc_y") / col("n")
    val hxy = log(col("n").cast("double")) - col("clc_xy") / col("n")
    val mi = hx + hy - hxy
    agg.crossJoin(broadcast(aggX)).crossJoin(broadcast(aggY))
      .select(col("n"), col("n_cells"),
        round(hx, 6).as("h_x"), round(hy, 6).as("h_y"),
        round(hxy, 6).as("h_xy"), round(mi, 6).as("mi"),
        when(hx > 0 && hy > 0, round(mi / sqrt(hx * hy), 6))
          .as("nmi"))
  }

  /** G-test of independence (log-likelihood-ratio χ²): G = 2 Σ O·ln(O/E)
    * over the joint cell table — the information-theoretic twin of the
    * Pearson chi-square (G = 2N·MI in nats, an identity this
    * implementation makes literal by reusing the same exact-count cell
    * entropies), preferred when any O/E ratio is large, where Pearson's
    * quadratic approximation degrades. Complete-case on BOTH
    * category columns (fuzz-15 finding: a null class used to be
    * counted in n but silently dropped from the margins-join G sum
    * and from countDistinct's df — three different answers to "is
    * null a class"; now rows with a null category are out of the
    * table entirely, stated). Output (one row): n BIGINT,
    * df BIGINT = (r−1)(c−1), g 4dp, pearson_chi2 4dp (for the
    * side-by-side read). */
  def gTest(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
    val mx = cells.groupBy(col("x")).agg(sum(col("c")).as("cx"))
    val my = cells.groupBy(col("y")).agg(sum(col("c")).as("cy"))
    val joined = cells
      .join(broadcast(mx), Seq("x")).join(broadcast(my), Seq("y"))
    val nTot = cells.agg(sum(col("c")).as("n"),
      countDistinct(col("x")).as("nx"), countDistinct(col("y")).as("ny"))
    val withN = joined.crossJoin(broadcast(nTot))
    val e = col("cx").cast("double") * col("cy") / col("n")
    withN.agg(
      max(col("n")).as("n"),
      ((max(col("nx")) - 1) * (max(col("ny")) - 1)).as("df"),
      round(lit(2.0) * sum(col("c") * log(col("c") / e)), 4).as("g"),
      round(sum(pow(col("c") - e, 2) / e), 4).as("pearson_chi2"))
  }

  /** Directional categorical association Y←X: Goodman–Kruskal
    * λ(Y|X) — the proportional reduction in modal-prediction error
    * from knowing X — and the uncertainty coefficient
    * U(Y|X) = I(X;Y)/H(Y) — the entropy fraction of Y that X
    * explains. λ can be 0 when association exists off the modes;
    * U cannot — reading both is the standard practice. Both reduce to
    * the joint cell table (category-domain-bounded), max-per-x via
    * one more aggregate, entropies via exact count·ln(count) sums.
    * Output (one row): (n BIGINT, lambda 6dp, uncertainty 6dp);
    * degenerate H(Y) = 0 yields null uncertainty. */
  def predictiveAssociation(df: DataFrame, xCol: String,
                            yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
    val perX = cells.groupBy(col("x"))
      .agg(max(col("c")).as("mx"), sum(col("c")).as("cx"))
    val my = cells.groupBy(col("y")).agg(sum(col("c")).as("cy"))
    val a = perX.agg(sum(col("mx")).as("smax"),
      sum(col("cx")).as("n"),
      sum(col("cx").cast("double") * log(col("cx").cast("double")))
        .as("clc_x"))
    val b = my.agg(max(col("cy")).as("ymax"),
      sum(col("cy").cast("double") * log(col("cy").cast("double")))
        .as("clc_y"))
    val j = cells.agg(sum(col("c").cast("double") *
      log(col("c").cast("double"))).as("clc_xy"))
    val n = col("n").cast("double")
    val hx = log(n) - col("clc_x") / n
    val hy = log(n) - col("clc_y") / n
    val hxy = log(n) - col("clc_xy") / n
    a.crossJoin(broadcast(b)).crossJoin(broadcast(j))
      .select(col("n"),
        round((col("smax") - col("ymax")).cast("double") /
          nullif((col("n") - col("ymax")).cast("double"), lit(0.0)), 6)
          .as("lambda"),
        round((hx + hy - hxy) / nullif(hy, lit(0.0)), 6)
          .as("uncertainty"))
  }
}
