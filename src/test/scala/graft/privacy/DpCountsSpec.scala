package graft.privacy

import graft.SparkSuite

class DpCountsSpec extends SparkSuite {
  import spark.implicits._

  test("dpCounts: released = count + deterministic Laplace noise") {
    val df = (Seq.fill(10)("a") ++ Seq.fill(5)("b")).toDF("g")
    val r = Privacy.dpCounts(df, "g", epsilon = 1.0, seedSalt = "s")
      .orderBy("g")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(r.map(_._2).toSeq == Seq(10L, 5L))
    // released is exactly count + noise at 4dp, replayable
    r.foreach { x =>
      assert(x._4 == math.rint((x._2 + x._3) * 1e4) / 1e4 ||
        math.abs(x._4 - (x._2 + x._3)) < 2e-4)
      assert(x._5 == 1.0)
    }
    // same seed, same noise; different salt, different noise
    val r2 = Privacy.dpCounts(df, "g", 1.0, "s")
      .orderBy("g").as[(String, Long, Double, Double, Double)].collect()
    assert(r.toSeq == r2.toSeq)
    val r3 = Privacy.dpCounts(df, "g", 1.0, "other")
      .orderBy("g").as[(String, Long, Double, Double, Double)].collect()
    assert(r3.map(_._3).toSeq != r.map(_._3).toSeq)
  }

  test("dpCounts: smaller epsilon means larger noise scale") {
    val df = Seq.fill(100)("a").toDF("g")
    def noise(eps: Double) =
      Privacy.dpCounts(df, "g", eps, "s")
        .as[(String, Long, Double, Double, Double)].head()._3
    // scale is exactly 1/eps before the 4dp round; compare post-round
    // with a tolerance covering both rounds
    assert(math.abs(math.abs(noise(0.1)) - math.abs(noise(1.0)) * 10.0)
      < 5e-3)
  }
}
