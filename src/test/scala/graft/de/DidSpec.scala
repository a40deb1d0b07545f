package graft.de

import graft.SparkSuite

class DidSpec extends SparkSuite {
  import spark.implicits._

  test("didEstimate: hand-computed 2x2 cells") {
    // T pre: 10, 12 (m=11); T post: 20, 24 (m=22)
    // C pre: 5, 7 (m=6); C post: 9, 11 (m=10)
    // did = (22-11) - (10-6) = 7
    val df = Seq(
      (true, false, 10.0), (true, false, 12.0),
      (true, true, 20.0), (true, true, 24.0),
      (false, false, 5.0), (false, false, 7.0),
      (false, true, 9.0), (false, true, 11.0))
      .toDF("treated", "post", "v")
    val r = Experiment.didEstimate(df, "treated", "post", "v")
      .as[(Long, Long, Double, Double, Double, Double, Double)].head()
    assert(r == ((8L, 4L, 11.0, 22.0, 6.0, 10.0, 7.0)))
  }

  test("didEstimate: empty cell yields null estimate, not an error") {
    val df = Seq((true, true, 1.0), (false, false, 2.0))
      .toDF("treated", "post", "v")
    val r = Experiment.didEstimate(df, "treated", "post", "v")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].head()
    assert(r._3.isEmpty && r._6.isEmpty && r._7.isEmpty)
  }
}
