package graft.de

import graft.SparkSuite

class DriftSpec extends SparkSuite {
  import spark.implicits._

  test("identical distributions: every psi term is ~0") {
    val rows = (1 to 100).flatMap(i =>
      Seq((i.toLong * 10, true), (i.toLong * 10, false)))
    val out = Drift.psi(rows.toDF("v", "base"), "v", "base", nBins = 5)
      .collect()
    assert(out.forall(r => math.abs(r.getAs[Double]("psi_term")) < 1e-6))
    assert(out.map(_.getAs[Long]("n_a")).sum == 100L)
  }

  test("shifted distribution produces a large positive total PSI") {
    val base = (1 to 200).map(i => ((i % 50).toLong, true))
    val cur = (1 to 200).map(i => ((i % 50).toLong + 40L, false))
    val out = Drift.psi((base ++ cur).toDF("v", "base"), "v", "base",
      nBins = 10).collect()
    val total = out.map(_.getAs[Double]("psi_term")).sum
    assert(total > 0.25, s"total PSI $total")   // the retrain alarm zone
  }

  test("empty-side bins are Laplace-smoothed, never infinite") {
    val rows = Seq((0L, true), (1L, true), (100L, false))
    val out = Drift.psi(rows.toDF("v", "base"), "v", "base", nBins = 4)
      .collect()
    assert(out.forall(r => !r.getAs[Double]("psi_term").isInfinite))
    assert(out.forall(r => !r.getAs[Double]("psi_term").isNaN))
  }

  test("bins partition the value range; counts conserve") {
    val rows = (1 to 57).map(i => (i.toLong, i % 2 == 0))
    val out = Drift.psi(rows.toDF("v", "base"), "v", "base", nBins = 7)
      .collect()
    assert(out.map(_.getAs[Long]("n_a")).sum +
      out.map(_.getAs[Long]("n_b")).sum == 57L)
    assert(out.map(_.getAs[Long]("bin")).distinct.length == out.length)
  }
}
