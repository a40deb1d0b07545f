package graft.ml

import graft.SparkSuite

class CalibrationSpec extends SparkSuite {
  import spark.implicits._

  test("reliability: perfectly calibrated bins have gap 0 and ECE 0") {
    // bin .2: 1 of 5 positive; bin .8: 4 of 5 positive
    val df = (Seq.fill(4)((0L, 0.2)) ++ Seq((1L, 0.2)) ++
      Seq.fill(4)((1L, 0.8)) ++ Seq((0L, 0.8))).toDF("y", "p")
    val rows = Calibration.reliability(df, "y", "p", nBins = 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(rows(2L).getAs[Double]("gap") == 0.0)
    assert(rows(8L).getAs[Double]("gap") == 0.0)
    assert(rows(2L).getAs[Double]("ece") == 0.0)
  }

  test("reliability: systematic overconfidence shows up as ECE") {
    // forecasts say .9 but only half happen
    val df = (Seq.fill(5)((1L, 0.9)) ++ Seq.fill(5)((0L, 0.9)))
      .toDF("y", "p")
    val r = Calibration.reliability(df, "y", "p").collect().head
    assert(r.getAs[Long]("bin") == 9L)
    assert(r.getAs[Double]("gap") == 0.4)
    assert(r.getAs[Double]("ece") == 0.4)
    // p = 1.0 clamps into the top bin
    val top = Calibration.reliability(
      Seq((1L, 1.0), (1L, 0.95)).toDF("y", "p"), "y", "p").collect()
    assert(top.length == 1 && top.head.getAs[Long]("bin") == 9L)
  }

  test("brierDecomposition: hand-computed panel") {
    // all forecasts .5, half positive: brier .25, rel 0 (bin mean = rate),
    // res 0 (bin rate = base), unc .25
    val df = (Seq.fill(2)((1L, 0.5)) ++ Seq.fill(2)((0L, 0.5)))
      .toDF("y", "p")
    val r = Calibration.brierDecomposition(df, "y", "p").collect().head
    assert(r.getAs[Double]("brier") == 0.25)
    assert(r.getAs[Double]("reliability") == 0.0)
    assert(r.getAs[Double]("resolution") == 0.0)
    assert(r.getAs[Double]("uncertainty") == 0.25)
  }

  test("brierDecomposition: sharp correct forecasts drive resolution " +
    "up and brier down") {
    val df = (Seq.fill(5)((1L, 0.95)) ++ Seq.fill(5)((0L, 0.05)))
      .toDF("y", "p")
    val r = Calibration.brierDecomposition(df, "y", "p").collect().head
    assert(r.getAs[Double]("brier") < 0.01)
    assert(r.getAs[Double]("resolution") == 0.25)
    assert(r.getAs[Double]("uncertainty") == 0.25)
  }
}
