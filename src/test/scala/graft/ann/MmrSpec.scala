package graft.ann

import graft.SparkSuite

class MmrSpec extends SparkSuite {
  import spark.implicits._

  test("mmrSelect: diversity beats raw relevance order") {
    // candidates: 1 and 2 are near-duplicates (high mutual cos) with
    // top relevance; 3 is orthogonal with lower relevance. With
    // lambda=0.5 the pick order must be 1 (best rel), then 3
    // (2 is punished by similarity to 1), then 2.
    val cand = Seq(
      (1L, Seq(1.0, 0.0), 0.95),
      (2L, Seq(0.999, 0.04), 0.94),
      (3L, Seq(0.0, 1.0), 0.60)).toDF("id", "v", "rel")
    val r = Similarity.mmrSelect(cand, "id", "v", "rel", k = 3,
        lambda = 0.5)
      .orderBy("rank").as[(Long, Long, Double, Double)].collect()
    assert(r.map(_._2).toSeq == Seq(1L, 3L, 2L))
    assert(r(0)._4 == 0.475)          // 0.5 * 0.95
    // pick 2: id 3 mmr = 0.5*0.6 - 0.5*cos(v3,v1) = 0.3 - 0
    assert(r(1)._4 == 0.3)
  }

  test("mmrSelect: int-typed ids are normalized and null relevance " +
    "rows dropped up front") {
    val cand = Seq(
      (1, Seq(1.0, 0.0), Some(0.9)),
      (2, Seq(0.0, 1.0), Some(0.8)),
      (3, Seq(0.5, 0.5), None: Option[Double]))
      .toDF("id", "v", "rel") // id is IntegerType here
    val r = Similarity.mmrSelect(cand, "id", "v", "rel", k = 5,
        lambda = 0.7)
      .orderBy("rank").as[(Long, Long, Double, Double)].collect()
    assert(r.map(_._2).toSeq == Seq(1L, 2L)) // null-rel row 3 excluded
  }

  test("mmrSelect: k larger than candidate count returns all") {
    val cand = Seq((1L, Seq(1.0, 0.0), 0.9), (2L, Seq(0.0, 1.0), 0.8))
      .toDF("id", "v", "rel")
    val r = Similarity.mmrSelect(cand, "id", "v", "rel", k = 5,
        lambda = 0.7)
    assert(r.count() == 2)
  }

  test("mmrSelect: a string id fails fast with the contract message " +
    "instead of null-casting into a broken argmax") {
    val cand = Seq(("a", Seq(1.0, 0.0), 0.9), ("b", Seq(0.0, 1.0), 0.8))
      .toDF("id", "v", "rel")
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrSelect(cand, "id", "v", "rel", k = 2, lambda = 0.7)
    }
    assert(e.getMessage.contains("must be numeric"))
  }
}
