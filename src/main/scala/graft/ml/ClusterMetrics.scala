package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering / embedding-space quality metrics (X92): the simplified
  * silhouette — per point, a = distance to its OWN label centroid,
  * b = distance to the nearest OTHER centroid, s = (b−a)/max(a,b) —
  * and the nearest-centroid prediction it induces. The simplified
  * (centroid) variant is chosen deliberately: full silhouette is an
  * all-pairs O(n²) construct, while this one is
  * broadcast-centroids × points — the form that survives a
  * billion-vector table, and the one sklearn's `silhouette_score`
  * users switch to at scale anyway.
  *
  * Scale shape: centroids via ONE (label, dim) aggregate over the
  * posexploded vectors (shuffle ∝ labels×dim, never points×dim after
  * the map-side partial), collected to a k-row broadcast frame;
  * per-point distances are a crossJoin against that tiny frame with a
  * zip_with/aggregate dot — no point-to-point join anywhere.
  * Determinism: distances are 6-dp-rounded BEFORE the argmin so
  * centroid-mean accumulation noise (~1e-13) cannot flip the nearest
  * label; label asc breaks exact ties.
  */
object ClusterMetrics {

  /** Per-point silhouette + nearest-centroid prediction:
    * (idCol, label, pred_label, a_dist 6-dp, b_dist 6-dp,
    * silhouette 4-dp). `vecCol` is ARRAY<numeric> (cast to double).
    * (The 4-dp round here is the PER-POINT emission — it is also what
    * makes [[silhouetteByLabel]]'s snap-divided mean exact, since the
    * per-point terms already sit on the 4-dp grid; the MEAN itself is
    * emitted unrounded there. Verified round 15 — this doc and the
    * rollup's are describing different columns, not a stale pair.) */
  def simplifiedSilhouette(df: DataFrame, idCol: String, labelCol: String,
                           vecCol: String): DataFrame = {
    val pts = df.select(col(idCol).as("__id"),
      col(labelCol).cast("long").as("__lbl"),
      col(vecCol).cast("array<double>").as("__v"))
    val cent = pts
      .select(col("__lbl"), posexplode(col("__v")).as(Seq("__d", "__x")))
      .groupBy(col("__lbl"), col("__d"))
      .agg(avg(col("__x")).as("__m"))
      .groupBy(col("__lbl"))
      .agg(array_sort(collect_list(struct(col("__d"), col("__m"))))
        .as("__ms"))
      .select(col("__lbl").as("__clbl"),
        transform(col("__ms"), e => e.getField("__m")).as("__c"))
    val dist = pts.crossJoin(broadcast(cent))
      .select(col("__id"), col("__lbl"), col("__clbl"),
        round(sqrt(aggregate(
          zip_with(col("__v"), col("__c"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, e) => acc + e)), 6).as("__dist"))
    val agg = dist.groupBy(col("__id"), col("__lbl"))
      .agg(
        min(when(col("__clbl") === col("__lbl"), col("__dist")))
          .as("a_dist"),
        min(when(col("__clbl") =!= col("__lbl"),
          struct(col("__dist"), col("__clbl")))).as("__b"))
    agg.select(col("__id").as(idCol), col("__lbl").as("label"),
      col("__b").getField("__clbl").as("pred_when_other"),
      col("a_dist"), col("__b").getField("__dist").as("b_dist"))
      .withColumn("pred_label",
        when(col("a_dist") <= col("b_dist"), col("label"))
          .otherwise(col("pred_when_other")))
      .withColumn("silhouette",
        when(greatest(col("a_dist"), col("b_dist")) > 0,
          round((col("b_dist") - col("a_dist")) /
            greatest(col("a_dist"), col("b_dist")), 4))
          .otherwise(lit(0.0)))
      .drop("pred_when_other")
  }

  /** Whole-clustering validity indices over labeled vectors:
    * Calinski–Harabasz = [B/(k−1)]/[W/(n−k)] (higher = tighter,
    * better-separated) and Davies–Bouldin = mean over clusters of
    * max_j (S_i + S_j)/M_ij (lower better) — the two standard
    * single-number answers to "is this clustering any good", next to
    * the per-point [[simplifiedSilhouette]]. Everything reduces to
    * centroid statistics: one (label, dim) aggregate, one per-point
    * distance pass against broadcast centroids, one k²-bounded
    * centroid-pair frame. Output (one row): (n BIGINT, k INT,
    * ch_index 4dp, db_index 4dp); k < 2 yields nulls. */
  def validityIndices(df: DataFrame, idCol: String, labelCol: String,
                      vecCol: String): DataFrame = {
    val pts = df.select(col(labelCol).cast("long").as("__lbl"),
      posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("__d", "__x")))
    val cent = pts.groupBy(col("__lbl"), col("__d"))
      .agg(avg(col("__x")).as("__m"), count(lit(1)).as("__nk"))
    val glob = pts.groupBy(col("__d")).agg(avg(col("__x")).as("__gm"))
    val w = pts.join(broadcast(cent.select(col("__lbl"), col("__d"),
        col("__m"))), Seq("__lbl", "__d"))
      .agg(sum((col("__x") - col("__m")) * (col("__x") - col("__m")))
        .as("__w"))
    val b = cent.join(broadcast(glob), Seq("__d"))
      .agg(sum(col("__nk") * (col("__m") - col("__gm")) *
        (col("__m") - col("__gm"))).as("__b"))
    // per-point euclidean distance to own centroid -> S_k
    val pd = df.select(col(labelCol).cast("long").as("__lbl"),
        col(idCol).as("__rid"),
        posexplode(col(vecCol).cast("array<double>"))
          .as(Seq("__d", "__x")))
      .join(broadcast(cent.select(col("__lbl"), col("__d"),
        col("__m"))), Seq("__lbl", "__d"))
      .groupBy(col("__lbl"), col("__rid"))
      .agg(sqrt(sum((col("__x") - col("__m")) *
        (col("__x") - col("__m")))).as("__dist"))
    val sk = pd.groupBy(col("__lbl")).agg(avg(col("__dist")).as("__s"))
    val ca = cent.select(col("__lbl").as("__la"), col("__d"),
      col("__m").as("__ma"))
    val cb = cent.select(col("__lbl").as("__lb"), col("__d"),
      col("__m").as("__mb"))
    val cd = ca.join(cb, Seq("__d"))
      .filter(col("__la") =!= col("__lb"))
      .groupBy(col("__la"), col("__lb"))
      .agg(sqrt(sum((col("__ma") - col("__mb")) *
        (col("__ma") - col("__mb")))).as("__mij"))
    val dbi = cd
      .join(broadcast(sk.select(col("__lbl").as("__la"),
        col("__s").as("__sa"))), Seq("__la"))
      .join(broadcast(sk.select(col("__lbl").as("__lb"),
        col("__s").as("__sb"))), Seq("__lb"))
      .groupBy(col("__la"))
      .agg(max((col("__sa") + col("__sb")) /
        nullif(col("__mij"), lit(0.0))).as("__mx"))
      .agg(avg(col("__mx")).as("__db"))
    val meta = df.agg(count(lit(1)).as("n"),
      countDistinct(col(labelCol)).cast("int").as("k"))
    val kD = col("k").cast("double")
    val nD = col("n").cast("double")
    meta.crossJoin(broadcast(w)).crossJoin(broadcast(b))
      .crossJoin(broadcast(dbi))
      .select(col("n"), col("k"),
        when(col("k") >= 2,
          round((col("__b") / (kD - 1)) /
            nullif(col("__w") / (nD - kD), lit(0.0)), 4))
          .as("ch_index"),
        when(col("k") >= 2, round(col("__db"), 4)).as("db_index"))
  }

  /** Label-grain rollup of [[simplifiedSilhouette]]: (label, n,
    * mean_silhouette — an unrounded snap-divided double: exact integer
    * ten-thousandths numerator / exact division, no final round —
    * n_misassigned BIGINT — points whose nearest centroid is NOT their
    * own label's). Snap headroom: silhouettes sit in [−1, 1], so the
    * scaled sum stays < 2^53 up to ~9e8 points per label — far past
    * any label this rollup meets. */
  def silhouetteByLabel(df: DataFrame, idCol: String, labelCol: String,
                        vecCol: String): DataFrame =
    simplifiedSilhouette(df, idCol, labelCol, vecCol)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        // q94 snap-divide discipline (fuzz-41): per-point silhouettes
        // quantize to the 4-dp grid, the sum snaps to exact integer
        // ten-thousandths (absorbing cross-engine float-path ulps that
        // a plain avg+round lets straddle a .xxxx5 boundary), and the
        // one exact division is emitted with NO final round — identical
        // doubles by construction.
        (round(sum(round(col("silhouette"), 4)) * 1e4) /
          (lit(1e4) * count(lit(1)))).as("mean_silhouette"),
        sum(when(col("pred_label") =!= col("label"), 1L).otherwise(0L))
          .as("n_misassigned"))
}
