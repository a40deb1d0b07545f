package graft.sample

import graft.SparkSuite

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private val rows = (0L until 1000L).map(i => (i, s"s${i % 4}")).toDF("k", "g")

  test("hashSample: deterministic, partitioning-independent, ~fraction") {
    val a = Sampling.hashSample(rows, "k", 0.2).select("k").as[Long].collect().sorted
    val b = Sampling.hashSample(rows.repartition(13), "k", 0.2)
      .select("k").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq, "sample must not depend on partitioning")
    assert(a.length > 120 && a.length < 280, s"got ${a.length} of ~200")
    // salted sample is decorrelated, not a subset/superset
    val c = Sampling.hashSample(rows, "k", 0.2, salt = "x")
      .select("k").as[Long].collect().toSet
    assert(c != a.toSet)
  }

  test("stratifiedHashSample: exactly n per stratum, deterministic") {
    val got = Sampling.stratifiedHashSample(rows, "g", "k", 10)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got == Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L, "s3" -> 10L))
    val again = Sampling.stratifiedHashSample(rows.repartition(7), "g", "k", 10)
      .select("k").as[Long].collect().sorted
    val first = Sampling.stratifiedHashSample(rows, "g", "k", 10)
      .select("k").as[Long].collect().sorted
    assert(again.toSeq == first.toSeq)
  }
}
