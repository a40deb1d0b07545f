package graft.events

import graft.SparkSuite

class LittlesLawSpec extends SparkSuite {
  import spark.implicits._

  test("littlesLaw: L = lambda * W holds and the peak matches the " +
    "overlap") {
    // key k: 3 intervals over a 10-second span (micros), two overlap
    val us = 1000000L
    val iv = Seq(("k", 0L * us, 4L * us), ("k", 2L * us, 6L * us),
      ("k", 8L * us, 10L * us)).toDF("g", "s", "e")
    val r = Intervals.littlesLaw(iv, "g", "s", "e").head()
    assert(r.getAs[Double]("span_sec") == 10.0)
    assert(r.getAs[Double]("w_avg_sec") ==
      math.round((4 + 4 + 2) / 3.0 * 1e4) / 1e4)
    assert(r.getAs[Double]("l_avg") == 1.0)          // 10s busy / 10s
    val lam = r.getAs[Double]("arrivals_per_hour") / 3600.0
    val w = r.getAs[Double]("w_avg_sec")
    assert(math.abs(lam * w - r.getAs[Double]("l_avg")) < 1e-3)
    assert(r.getAs[Long]("peak") == 2L)
  }

  test("littlesLaw: zero-span key yields null rates, not a divide " +
    "error") {
    val iv = Seq(("z", 5L, 5L)).toDF("g", "s", "e")
    val r = Intervals.littlesLaw(iv, "g", "s", "e").head()
    assert(r.isNullAt(r.fieldIndex("arrivals_per_hour")))
    assert(r.isNullAt(r.fieldIndex("l_avg")))
    assert(r.getAs[Long]("n_intervals") == 1L)
  }
}
