package graft.events

import java.sql.Timestamp

import graft.SparkSuite

class CircadianSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("timeOfDayStats: midnight-straddling peak resolves to ~0h, " +
    "not noon") {
    val df = Seq(("a", ts("2024-01-01 23:00:00")),
      ("a", ts("2024-01-02 01:00:00"))).toDF("g", "t")
    val r = Circadian.timeOfDayStats(df, "g", "t").head()
    // arithmetic mean of 23 and 1 is 12; circular mean is 0 (midnight)
    val peak = r.getAs[Double]("peak_hour")
    assert(peak < 0.001 || peak > 23.999, s"peak was $peak")
    // 2h apart on a 24h circle -> R = cos(pi/12)
    assert(r.getAs[Double]("r_bar") ==
      math.round(math.cos(math.Pi / 12) * 1e4) / 1e4)
  }

  test("timeOfDayStats: uniform 4-point spread has zero resultant " +
    "and null peak") {
    val df = Seq("00:00:00", "06:00:00", "12:00:00", "18:00:00")
      .map(h => ("u", ts(s"2024-01-01 $h"))).toDF("g", "t")
    val r = Circadian.timeOfDayStats(df, "g", "t").head()
    assert(r.getAs[Double]("r_bar") == 0.0)
    assert(r.isNullAt(r.fieldIndex("peak_hour")))
    assert(r.getAs[Double]("circ_variance") == 1.0)
  }

  test("timeOfDayStats: concentrated times give R near 1 and the " +
    "right peak") {
    val df = Seq("14:00:00", "14:30:00", "15:00:00")
      .map(h => ("c", ts(s"2024-01-01 $h"))).toDF("g", "t")
    val row = Circadian.timeOfDayStats(df, "g", "t").head()
    assert(math.abs(row.getAs[Double]("peak_hour") - 14.5) < 0.01)
    assert(row.getAs[Double]("r_bar") > 0.99)
  }
}
