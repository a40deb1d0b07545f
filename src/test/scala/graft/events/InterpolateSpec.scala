package graft.events

import graft.SparkSuite

class InterpolateSpec extends SparkSuite {
  import spark.implicits._

  private def series(vs: Seq[Option[Long]]) =
    vs.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("g", "t", "v")

  private def interp(vs: Seq[Option[Long]]): Map[Long, (Double, Boolean)] =
    Interpolate.linear(series(vs), "g", "t", "v").collect()
      .map(r => r.getAs[Long]("t") ->
        ((r.getAs[Double]("x_interp"), r.getAs[Boolean]("is_filled"))))
      .toMap

  test("interior gap takes the exact line between neighbors") {
    val m = interp(Seq(Some(10L), None, None, Some(40L)))
    assert(m(0L) == ((10.0, false)))
    assert(m(1L) == ((20.0, true)))
    assert(m(2L) == ((30.0, true)))
    assert(m(3L) == ((40.0, false)))
  }

  test("leading and trailing nulls clamp to the nearest known value") {
    val m = interp(Seq(None, Some(5L), Some(7L), None, None))
    assert(m(0L) == ((5.0, true)))
    assert(m(3L) == ((7.0, true)))
    assert(m(4L) == ((7.0, true)))
  }

  test("uneven gap positions weight by distance") {
    // known at t=0 (0) and t=4 (8): t=3 → 6.0
    val m = interp(Seq(Some(0L), None, None, None, Some(8L)))
    assert(m(1L)._1 == 2.0)
    assert(m(3L)._1 == 6.0)
  }

  test("dense series passes through untouched") {
    val m = interp(Seq(Some(1L), Some(2L), Some(3L)))
    assert(m.values.forall(!_._2))
    assert(m(1L)._1 == 2.0)
  }
}
