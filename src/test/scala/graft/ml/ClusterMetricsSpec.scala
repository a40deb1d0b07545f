package graft.ml

import graft.SparkSuite

class ClusterMetricsSpec extends SparkSuite {
  import spark.implicits._

  // two tight, well-separated clusters on a line
  private val good = Seq(
    (1L, 0, Seq(0.0, 0.0)), (2L, 0, Seq(1.0, 0.0)),
    (3L, 1, Seq(10.0, 0.0)), (4L, 1, Seq(11.0, 0.0)))
    .toDF("id", "label", "vec")

  test("well-separated clusters: high silhouette, no misassignment") {
    val rows = ClusterMetrics.simplifiedSilhouette(good, "id", "label",
      "vec").collect()
    assert(rows.forall(r =>
      r.getAs[Long]("pred_label") == r.getAs[Long]("label")))
    assert(rows.forall(_.getAs[Double]("silhouette") > 0.9))
    // point 1: own centroid (0.5,0) → a = 0.5; other (10.5,0) → b = 10.5
    val p1 = rows.find(_.getAs[Long](0) == 1L).get
    assert(p1.getAs[Double]("a_dist") == 0.5)
    assert(p1.getAs[Double]("b_dist") == 10.5)
    assert(p1.getAs[Double]("silhouette") ==
      math.rint((10.5 - 0.5) / 10.5 * 1e4) / 1e4)
  }

  test("a point sitting in the other cluster is flagged misassigned " +
    "with negative silhouette") {
    val bad = good.union(
      Seq((5L, 0, Seq(10.5, 0.0))).toDF("id", "label", "vec"))
    val r = ClusterMetrics.simplifiedSilhouette(bad, "id", "label",
        "vec").collect().find(_.getAs[Long](0) == 5L).get
    assert(r.getAs[Long]("pred_label") == 1L)
    assert(r.getAs[Double]("silhouette") < 0.0)
    val roll = ClusterMetrics.silhouetteByLabel(bad, "id", "label",
        "vec").collect().map(r0 => r0.getAs[Long]("label") -> r0).toMap
    assert(roll(0L).getAs[Long]("n_misassigned") == 1L)
    assert(roll(1L).getAs[Long]("n_misassigned") == 0L)
  }

  test("coincident centroids: zero distances yield silhouette 0, " +
    "own label wins the tie") {
    val tied = Seq((1L, 0, Seq(1.0, 1.0)), (2L, 1, Seq(1.0, 1.0)))
      .toDF("id", "label", "vec")
    val rows = ClusterMetrics.simplifiedSilhouette(tied, "id", "label",
      "vec").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("silhouette") == 0.0)
      assert(r.getAs[Long]("pred_label") == r.getAs[Long]("label"))
    }
  }
}
