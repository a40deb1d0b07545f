package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Shapley-value channel attribution for a bounded channel set
  * (Shapley 1953 applied to marketing mix à la Zhao et al. 2018): the
  * characteristic function v(S) is the observed conversion rate of
  * users whose touched-channel set is exactly S, and each channel's
  * credit is Σ_{S ∌ i} |S|!(n−1−|S|)!/n! · (v(S∪i) − v(S)).
  *
  * Exact Shapley is 2^n in the CHANNEL count — which is the bounded
  * axis (a marketing mix has a handful of channels), never the user
  * count: the plan is one user-grain aggregate (channel flags +
  * conversion), one coalition-grain aggregate (≤ 2^n rows), and a
  * single-row pivot the closed-form weights fold over. Coalitions with
  * no users contribute v = 0 (documented; the alternative — imputing —
  * is a modeling choice this operator refuses to hide).
  */
object Shapley {

  /** Three-channel exact attribution. `df` is an event stream; rows
    * whose `typeCol` is in `channels` (exactly 3) mark touches, rows
    * equal to `convType` mark conversion. Output: one row per channel
    * (channel, shapley 6dp), ordered by channel, plus the grand
    * conversion rate repeated for context.
    */
  def threeChannel(df: DataFrame, userCol: String, typeCol: String,
                   channels: Seq[String], convType: String): DataFrame = {
    require(channels.size == 3 && channels.distinct.size == 3,
      "exactly 3 distinct channels")
    val Seq(c1, c2, c3) = channels
    val perUser = df.groupBy(col(userCol))
      .agg(max(when(col(typeCol) === c1, 1).otherwise(0)).as("h1"),
        max(when(col(typeCol) === c2, 1).otherwise(0)).as("h2"),
        max(when(col(typeCol) === c3, 1).otherwise(0)).as("h3"),
        max(when(col(typeCol) === convType, 1).otherwise(0)).as("cv"))
    val coal = perUser.groupBy(col("h1"), col("h2"), col("h3"))
      .agg(count(lit(1)).as("n"), sum(col("cv")).as("k"))
    // pivot the (≤8)-row coalition table into one row of rates;
    // missing coalitions coalesce to rate 0
    def r(a: Int, b: Int, c: Int) = coalesce(
      max(when(col("h1") === a && col("h2") === b && col("h3") === c,
        col("k").cast("double") / col("n"))),
      lit(0.0))
    val wide = coal.agg(
      r(0, 0, 0).as("v000"), r(1, 0, 0).as("v100"),
      r(0, 1, 0).as("v010"), r(0, 0, 1).as("v001"),
      r(1, 1, 0).as("v110"), r(1, 0, 1).as("v101"),
      r(0, 1, 1).as("v011"), r(1, 1, 1).as("v111"),
      (sum(col("k")) / sum(col("n"))).as("__grand"))
    // n=3 weights: |S|=0 → 1/3, |S|=1 → 1/6, |S|=2 → 1/3
    def shap(vIn: Seq[(String, String)], w: Seq[Double]) =
      vIn.zip(w).map { case ((hi, lo), wt) =>
        lit(wt) * (col(hi) - col(lo)) }.reduce(_ + _)
    val s1 = shap(Seq(("v100", "v000"), ("v110", "v010"),
      ("v101", "v001"), ("v111", "v011")),
      Seq(1.0 / 3, 1.0 / 6, 1.0 / 6, 1.0 / 3))
    val s2 = shap(Seq(("v010", "v000"), ("v110", "v100"),
      ("v011", "v001"), ("v111", "v101")),
      Seq(1.0 / 3, 1.0 / 6, 1.0 / 6, 1.0 / 3))
    val s3 = shap(Seq(("v001", "v000"), ("v101", "v100"),
      ("v011", "v010"), ("v111", "v110")),
      Seq(1.0 / 3, 1.0 / 6, 1.0 / 6, 1.0 / 3))
    val spark = df.sparkSession
    import spark.implicits._
    val chDf = channels.zipWithIndex.map { case (c, i) => (c, i + 1) }
      .toDF("channel", "__ix")
    chDf.crossJoin(broadcast(wide))
      .select(col("channel"),
        round(when(col("__ix") === 1, s1)
          .when(col("__ix") === 2, s2)
          .otherwise(s3), 6).as("shapley"),
        round(col("__grand"), 6).as("overall_rate"))
      .orderBy(col("channel"))
  }
}
