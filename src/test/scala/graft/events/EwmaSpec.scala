package graft.events

import graft.SparkSuite

class EwmaSpec extends SparkSuite {
  import spark.implicits._

  private def ref(xs: Seq[Double], a: Double): Double =
    xs.tail.foldLeft(xs.head)((acc, x) => (1 - a) * acc + a * x)

  test("ewmaLast replays the driver fold bit-for-bit (pre-round)") {
    val xs = Seq(10.0, 14.0, 9.0, 30.0, 12.0, 11.0, 50.0, 8.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "t", "x")
    val got = Ewma.ewmaLast(df, "g", "t", "x", alpha = 0.25).head()
    assert(got.getAs[Long]("n") == 8)
    assert(got.getAs[Double]("ewma_last") == BigDecimal(ref(xs, 0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("order comes from orderCol, not input order") {
    val df = Seq(("g", 3, 100.0), ("g", 1, 1.0), ("g", 2, 1.0),
      ("g", 0, 1.0)).toDF("g", "t", "x")
    val got = Ewma.ewmaLast(df, "g", "t", "x", 0.5).head()
      .getAs[Double]("ewma_last")
    assert(got == ref(Seq(1.0, 1.0, 1.0, 100.0), 0.5))
  }

  test("single point seeds itself; constant series is a fixpoint") {
    val one = Seq(("g", 0, 42.0)).toDF("g", "t", "x")
    assert(Ewma.ewmaLast(one, "g", "t", "x", 0.3).head()
      .getAs[Double]("ewma_last") == 42.0)
    val const = (0 until 9).map(i => ("g", i, 7.0)).toDF("g", "t", "x")
    assert(Ewma.ewmaLast(const, "g", "t", "x", 0.3).head()
      .getAs[Double]("ewma_last") == 7.0)
  }

  test("alpha = 1 tracks the last value; invalid alpha rejected") {
    val df = Seq(("g", 0, 5.0), ("g", 1, 17.0)).toDF("g", "t", "x")
    assert(Ewma.ewmaLast(df, "g", "t", "x", 1.0).head()
      .getAs[Double]("ewma_last") == 17.0)
    intercept[IllegalArgumentException] {
      Ewma.ewmaLast(df, "g", "t", "x", 0.0)
    }
  }

  test("holt: matches a driver-side fold of the same recurrence") {
    val xs = Seq(10.0, 12.0, 15.0, 13.0, 18.0, 21.0, 20.0, 25.0)
    val (alpha, beta) = (0.3, 0.1)
    var l = xs.head; var b = 0.0
    xs.tail.foreach { x =>
      val lNew = alpha * x + (1.0 - alpha) * (l + b)
      b = beta * (lNew - l) + (1.0 - beta) * b
      l = lNew
    }
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "t", "x")
    val r = Ewma.holtForecast(df, "g", "t", "x", alpha, beta)
      .collect().head
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Double]("level") ==
      BigDecimal(l).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("trend") ==
      BigDecimal(b).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("forecast_next") ==
      BigDecimal(l + b).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("holt: single point is level = x, trend = 0; constant series has zero trend") {
    val df = (Seq(("one", 0, 7.0)) ++
      (0 until 5).map(i => ("const", i, 4.0))).toDF("g", "t", "x")
    val m = Ewma.holtForecast(df, "g", "t", "x", 0.5, 0.2)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("forecast_next"))).toMap
    assert(m("one") == ((7.0, 0.0, 7.0)))
    assert(m("const") == ((4.0, 0.0, 4.0)))
  }

  test("holt: linear series trend approaches the true slope") {
    // x_t = 5 + 3t for 40 steps: with b seeded 0 the trend estimate
    // converges toward 3
    val df = (0 until 40).map(i => ("g", i, 5.0 + 3.0 * i))
      .toDF("g", "t", "x")
    val r = Ewma.holtForecast(df, "g", "t", "x", 0.5, 0.3)
      .collect().head
    assert(math.abs(r.getAs[Double]("trend") - 3.0) < 0.05)
  }
}
