package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Local Outlier Factor (Breunig, Kriegel, Ng & Sander 2000) — the
  * density-RATIO anomaly score the global z/MAD screens (q75) cannot
  * give: a point is anomalous if its local density is low RELATIVE TO
  * ITS OWN NEIGHBORS', so a tight cluster next to a sparse one scores
  * both correctly where any global threshold fails one of them.
  *
  * Scale shape: the naive form is an all-pairs kNN. This is the
  * grid-blocked form ([[graft.join.SpatialJoin]]'s X42 discipline):
  * cells of side `radius`, each point probes its 3×3 neighborhood (a
  * constant ×9 explode), candidates join on the cell key, and the kNN
  * is a per-point rank window over the candidate set — per-cell
  * density is the skew knob, and shuffle is candidate-proportional,
  * never n². The price is stated honestly: neighborhoods are
  * TRUNCATED at `radius` — a point whose true k-th neighbor lies
  * beyond `radius` gets a null score (choose `radius` so the k-NN of
  * typical points fits; the nulls themselves are the "radius too
  * small" diagnostic). The oracle replays the same truncation
  * brute-force, so the approximation is pinned, not hidden.
  *
  * Determinism contract: pair distances are 6-dp pre-rounded before
  * ANY comparison (ranking, k-distance, reachability max — the
  * SpatialJoin convention), with neighbor-id tie-breaks, so both
  * engines pick identical neighborhoods.
  */
object Lof {

  /** LOF over the euclidean plane (xCol, yCol), neighborhood size k.
    *
    * Per the paper: d_k(p) = distance to p's k-th nearest in-radius
    * neighbor (6-dp rounded); N_k(p) = all in-radius neighbors at
    * rank ≤ k (ties INSIDE the rounded distance are cut by id — a
    * stated simplification of the paper's "all points at the
    * k-distance" set, exact whenever rounded distances are distinct);
    * reach-dist_k(p, o) = max(d_k(o), d(p, o));
    * lrd(p) = k / Σ_{o ∈ N_k(p)} reach-dist_k(p, o);
    * LOF(p) = (Σ_{o} lrd(o) / k) / lrd(p) — ≈ 1 inside uniform
    * regions, ≫ 1 for outliers.
    *
    * Null contract — STRICT propagation (never engine null-skipping):
    * a point with fewer than k in-radius neighbors has null k_dist /
    * lrd / lof; a null neighbor k-distance nulls the reach pair, any
    * null reach nulls lrd, any null neighbor lrd nulls the LOF.
    * Duplicate point stacks deeper than k (Σ reach = 0) null out via
    * the 0 denominator rather than emitting ∞.
    *
    * Output: (id, n_neighbors BIGINT, k_dist 6dp, lrd 6dp, lof 4dp),
    * one row per input point with non-null coordinates — including
    * fully isolated points (n_neighbors = 0, null scores). */
  def localOutlierFactor(df: DataFrame, idCol: String, xCol: String,
                         yCol: String, k: Int,
                         radius: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(radius > 0, s"radius must be positive, got $radius")
    val pts = df.select(col(idCol).as("__id"),
        col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def cell(c: org.apache.spark.sql.Column) =
      floor(c / radius).cast("long")
    val probes = pts
      .select(col("__id").as("__a"), col("__x").as("__ax"),
        col("__y").as("__ay"),
        cell(col("__x")).as("__cx0"), cell(col("__y")).as("__cy0"))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("__a"), col("__ax"), col("__ay"),
        (col("__cx0") + col("__dx")).as("__cx"),
        (col("__cy0") + col("__dy")).as("__cy"))
    val cells = pts.select(col("__id").as("__b"),
      col("__x").as("__bx"), col("__y").as("__by"),
      cell(col("__x")).as("__cx"), cell(col("__y")).as("__cy"))
    val d = round(sqrt(
      (col("__ax") - col("__bx")) * (col("__ax") - col("__bx")) +
        (col("__ay") - col("__by")) * (col("__ay") - col("__by"))), 6)
    val w = Window.partitionBy(col("__a"))
      .orderBy(col("__d").asc, col("__b").asc)
    val knn = probes.join(cells, Seq("__cx", "__cy"))
      .filter(col("__a") =!= col("__b"))
      .withColumn("__d", d)
      .filter(col("__d") <= radius)
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(col("__a"), col("__b"), col("__d"))
    // k-distance per point; points with < k neighbors stay null
    val kd = knn.groupBy(col("__a"))
      .agg(count(lit(1)).as("n_neighbors"), max(col("__d")).as("__kd"))
      .withColumn("__kdk",
        when(col("n_neighbors") >= k, col("__kd")))
    // reach-dist uses the NEIGHBOR's k-distance. Null propagation is
    // STRICT and explicit (never via greatest/avg null-skipping,
    // whose semantics differ across engines): a neighbor without a
    // k-distance nulls the reach pair, any null reach nulls lrd, any
    // null neighbor lrd nulls the LOF.
    val reach = knn
      .join(kd.select(col("__a").as("__b"), col("__kdk").as("__bkd")),
        Seq("__b"))
      .withColumn("__reach",
        when(col("__bkd").isNotNull, greatest(col("__bkd"), col("__d"))))
    val lrd = reach.groupBy(col("__a"))
      .agg(sum(col("__reach")).as("__sr"),
        count(lit(1)).as("__np"), count(col("__reach")).as("__nr"))
      .withColumn("__lrd",
        when(col("__np") === col("__nr"),
          lit(k.toDouble) / nullif(col("__sr"), lit(0.0))))
    val nbLrd = knn
      .join(lrd.select(col("__a").as("__b"), col("__lrd").as("__blrd")),
        Seq("__b"))
      .groupBy(col("__a"))
      .agg(avg(col("__blrd")).as("__avg0"),
        count(lit(1)).as("__nn"), count(col("__blrd")).as("__nl"))
      .withColumn("__avgl",
        when(col("__nn") === col("__nl"), col("__avg0")))
    // the point set is the spine: a fully isolated point (zero
    // in-radius neighbors — the most extreme outlier of all) must
    // still emit its row, with n_neighbors = 0 and null scores
    pts.select(col("__id").as("__a"))
      .join(kd, Seq("__a"), "left")
      .join(lrd, Seq("__a"), "left")
      .join(nbLrd, Seq("__a"), "left")
      .select(col("__a").as(idCol),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        round(col("__kdk"), 6).as("k_dist"),
        round(when(col("n_neighbors") >= k, col("__lrd")), 6)
          .as("lrd"),
        round(when(col("n_neighbors") >= k,
          col("__avgl") / col("__lrd")), 4).as("lof"))
  }
}
