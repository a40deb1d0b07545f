package graft.sample

import graft.SparkSuite

class NegativeSampleSpec extends SparkSuite {
  import spark.implicits._

  test("negativeSample: excludes positives, deterministic, k-bounded") {
    val pos = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("e", "i")
    val items = Seq("a", "b", "c", "d", "e").map(Tuple1(_)).toDF("i")
    val r = Sampling.negativeSample(pos, "e", "i", items, k = 2, "s")
      .orderBy("e", "neg_rank")
      .as[(Long, String, Long)].collect().toSeq
    // entity 1 can only draw from {c,d,e}; entity 2 from {b,c,d,e}
    assert(r.count(_._1 == 1L) == 2 && r.count(_._1 == 2L) == 2)
    assert(!r.exists(x => x._1 == 1L && (x._2 == "a" || x._2 == "b")))
    assert(!r.exists(x => x._1 == 2L && x._2 == "a"))
    // determinism: second run identical
    val r2 = Sampling.negativeSample(pos, "e", "i", items, k = 2, "s")
      .orderBy("e", "neg_rank").as[(Long, String, Long)].collect().toSeq
    assert(r == r2)
    // different salt reorders at least one entity's draw
    val r3 = Sampling.negativeSample(pos, "e", "i", items, k = 2, "zz")
      .orderBy("e", "neg_rank").as[(Long, String, Long)].collect().toSeq
    assert(r3.size == 4)
  }

  test("negativeSample: k above candidate count returns all negatives") {
    val pos = Seq((1L, "a")).toDF("e", "i")
    val items = Seq("a", "b").map(Tuple1(_)).toDF("i")
    val r = Sampling.negativeSample(pos, "e", "i", items, k = 5, "s")
      .as[(Long, String, Long)].collect().toSeq
    assert(r.map(_._2) == Seq("b"))
  }
}
