package graft.events

import graft.SparkSuite

class SpectralSpec extends SparkSuite {
  import spark.implicits._

  test("periodogram: pure cosine at period 4 concentrates power there") {
    // x_t = cos(2*pi*t/4) over t = 0..7: power at P=4 should carry
    // ~all variance; P=2 near zero.
    val rows = (0 until 8).map(t =>
      ("k", t.toLong, math.cos(2 * math.Pi * t / 4)))
    val df = rows.toDF("k", "b", "v")
    val r = Spectral.periodogram(df, "k", "b", "v", Seq(2, 4))
      .orderBy("period")
      .as[(String, Int, Long, Double, Double)].collect()
    assert(r(0)._2 == 2 && r(0)._4 < 1e-9)
    // A = sum(cos^2) = 4 (mean is 0), power = (16+0)*2/8 = 4
    assert(math.abs(r(1)._4 - 4.0) < 1e-6)
    assert(math.abs(r(1)._5 - 1.0) < 1e-6) // (A^2/Cc)/ss = 4/4
  }

  test("periodogram: constant series has zero power, null share") {
    val df = (0 until 6).map(t => ("k", t.toLong, 5.0)).toDF("k", "b", "v")
    val r = Spectral.periodogram(df, "k", "b", "v", Seq(3))
      .as[(String, Int, Long, Double, Option[Double])].head()
    assert(r._4 == 0.0 && r._5.isEmpty)
  }
}
