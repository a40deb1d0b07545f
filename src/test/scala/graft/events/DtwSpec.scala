package graft.events

import graft.SparkSuite

class DtwSpec extends SparkSuite {
  import spark.implicits._

  /** Driver-side replica of the identical DP. */
  private def ref(a: Seq[Double], b: Seq[Double]): Double = {
    val m = b.size
    var prev = 0.0 +: Seq.fill(m)(Double.PositiveInfinity)
    a.foreach { av =>
      var row = Vector(Double.PositiveInfinity)
      b.zipWithIndex.foreach { case (bv, j0) =>
        val j = j0 + 1
        val cost = math.abs(av - bv) +
          math.min(prev(j - 1), math.min(prev(j), row(j - 1)))
        row = row :+ cost
      }
      prev = row
    }
    prev(m)
  }

  private def mk(rows: Seq[(String, Int, Double)]) =
    rows.toDF("k", "t", "v")

  test("matches the driver DP; self-distance is zero") {
    val a = Seq(1.0, 3.0, 4.0, 9.0, 8.0, 2.0, 1.0, 5.0, 7.0)
    val b = Seq(1.0, 4.0, 5.0, 10.0, 9.0, 3.0, 2.0, 6.0, 8.0)
    val rows = a.zipWithIndex.map { case (v, i) => ("qa", i, v) } ++
      b.zipWithIndex.map { case (v, i) => ("ref", i, v) }
    val got = Dtw.dtwToReference(mk(rows), "k", "t", "v", "ref")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(got("ref").getAs[Double]("dtw") == 0.0)
    assert(approx(got("qa").getAs[Double]("dtw"), ref(a, b), 1e-9))
    // dtw_norm is 6-dp display-rounded — compare at that grain
    assert(approx(got("qa").getAs[Double]("dtw_norm"),
      ref(a, b) / (a.size + b.size), 1e-6))
  }

  test("a phase-shifted copy aligns far closer than a reversed one") {
    // sawtooth, NOT a sine: a reversed sine is just a phase-shifted
    // sine (reflection symmetry), so it would NOT discriminate
    val base = (0 until 40).map(i => ((i % 10) * 2).toDouble)
    val shifted = (0 until 40).map(i =>
      ((((i - 3) % 10) + 10) % 10 * 2).toDouble)
    val rows =
      base.zipWithIndex.map { case (v, i) => ("ref", i, v) } ++
      shifted.zipWithIndex.map { case (v, i) => ("shift", i, v) } ++
      base.reverse.zipWithIndex.map { case (v, i) => ("rev", i, v) }
    val got = Dtw.dtwToReference(mk(rows), "k", "t", "v", "ref")
      .collect().map(r => r.getAs[String]("k") ->
        r.getAs[Double]("dtw")).toMap
    // euclidean pointwise distance of the shift is large (336); DTW
    // warps it nearly onto the reference (58); the reversed shape
    // cannot be warped close (256)
    val euclid = base.zip(shifted).map { case (x, y) =>
      math.abs(x - y) }.sum
    assert(got("shift") < euclid / 4)
    assert(got("rev") > got("shift") * 3)
  }

  test("order comes from orderCol; nulls dropped before alignment") {
    val rows = Seq(("ref", 0, Some(1.0)), ("ref", 1, Some(2.0)),
      ("q", 1, Some(2.0)), ("q", 0, Some(1.0)), ("q", 2, None))
      .toDF("k", "t", "v")
    val got = Dtw.dtwToReference(rows, "k", "t", "v", "ref")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(got("q").getAs[Long]("n") == 2)
    assert(got("q").getAs[Double]("dtw") == 0.0)
  }

  test("maxLen caps the quadratic: long series null out with length " +
    "reported; missing reference empties the output") {
    val rows = (0 until 20).map(i => ("long", i, i.toDouble)) ++
      Seq(("ref", 0, 1.0), ("ref", 1, 2.0))
    val got = Dtw.dtwToReference(mk(rows), "k", "t", "v", "ref",
        maxLen = 10)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(got("long").getAs[Long]("n") == 20)
    assert(got("long").isNullAt(got("long").fieldIndex("dtw")))
    assert(got("ref").getAs[Double]("dtw") == 0.0)
    assert(Dtw.dtwToReference(mk(rows), "k", "t", "v", "absent")
      .count() == 0)
  }
}
