package graft.events

import graft.SparkSuite

class CrostonSpec extends SparkSuite {
  import spark.implicits._

  test("croston: hand-traced intermittent series") {
    // series: 0, 4, 0, 0, 6  (alpha = 0.5)
    // t2 first demand: z = 4, p = 2 (1-based position)
    // t5 demand at gap 3: z = .5*6 + .5*4 = 5, p = .5*3 + .5*2 = 2.5
    // forecast = 5/2.5 = 2
    val df = Seq(("k", 1L, 0.0), ("k", 2L, 4.0), ("k", 3L, 0.0),
      ("k", 4L, 0.0), ("k", 5L, 6.0)).toDF("k", "t", "x")
    val r = Ewma.croston(df, "k", "t", "x", alpha = 0.5)
      .as[(String, Long, Long, Double, Double, Double)].head()
    assert(r == (("k", 5L, 2L, 5.0, 2.5, 2.0)))
  }

  test("croston: all-zero series yields nulls; leading demand seeds p=1") {
    val zero = Seq(("z", 1L, 0.0), ("z", 2L, 0.0)).toDF("k", "t", "x")
    val rz = Ewma.croston(zero, "k", "t", "x", alpha = 0.3)
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double])].head()
    assert(rz._3 == 0L && rz._4.isEmpty && rz._6.isEmpty)
    val lead = Seq(("l", 1L, 8.0), ("l", 2L, 0.0)).toDF("k", "t", "x")
    val rl = Ewma.croston(lead, "k", "t", "x", alpha = 0.3)
      .as[(String, Long, Long, Double, Double, Double)].head()
    assert(rl == (("l", 2L, 1L, 8.0, 1.0, 8.0)))
  }
}
