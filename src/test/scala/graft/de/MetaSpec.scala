package graft.de

import graft.SparkSuite

class MetaSpec extends SparkSuite {
  import spark.implicits._

  test("fixedEffect: hand-computed two-study pool") {
    // study 1: e=2, se=1 (w=1); study 2: e=4, se=2 (w=0.25)
    // pooled = (2 + 1)/1.25 = 2.4; se = sqrt(1/1.25) = 0.8944
    // Q = 1*(2-2.4)^2 + 0.25*(4-2.4)^2 = 0.16 + 0.64 = 0.8
    // I2 = max(0, (0.8-1)/0.8) = 0
    val df = Seq((2.0, 1.0), (4.0, 2.0)).toDF("e", "se")
    val r = Meta.fixedEffect(df, "e", "se")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(r._1 == 2 && r._2 == 2.4 && r._3 == 0.8944)
    assert(r._4 == math.rint(2.4 / math.sqrt(0.8) * 1e4) / 1e4)
    assert(r._5 == 0.8 && r._6 == 0.0)
  }

  test("fixedEffect: heterogeneous studies give positive I2") {
    // e = 0 and 10, both se=1: pooled 5, Q = 25+25 = 50, I2 = 49/50
    val df = Seq((0.0, 1.0), (10.0, 1.0)).toDF("e", "se")
    val r = Meta.fixedEffect(df, "e", "se")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(r._2 == 5.0 && r._5 == 50.0 && r._6 == 0.98)
  }

  test("fixedEffect: non-positive or null se rows are dropped") {
    val df = Seq((2.0, 1.0), (99.0, 0.0), (7.0, -1.0)).toDF("e", "se")
    val r = Meta.fixedEffect(df, "e", "se")
      .as[(Long, Double, Double, Double, Double, Option[Double])].head()
    assert(r._1 == 1 && r._2 == 2.0 && r._6.isEmpty)
  }
}
