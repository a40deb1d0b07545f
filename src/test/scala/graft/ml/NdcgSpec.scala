package graft.ml

import graft.SparkSuite

class NdcgSpec extends SparkSuite {
  import spark.implicits._

  test("ndcgAtK: hand-computed graded ranking") {
    // docs (id, rel, score): ranking by score: 1(rel3), 2(rel0), 3(rel2)
    // ideal by rel: 1, 3, 2
    // dcg = 7/log2(2) + 0 + 3/log2(4) = 7 + 1.5 = 8.5
    // idcg = 7/log2(2) + 3/log2(3) + 0 = 7 + 1.8927...
    val df = Seq(("q", 1L, 3.0, 0.9), ("q", 2L, 0.0, 0.8),
      ("q", 3L, 2.0, 0.7)).toDF("q", "id", "rel", "s")
    val r = Ranking.ndcgAtK(df, "q", "id", "rel", "s", k = 10)
      .as[(String, Long, Double, Double, Double, Double, Double)].head()
    val idcg = 7.0 + 3.0 / (math.log(3) / math.log(2))
    assert(r._2 == 3 && r._3 == 8.5)
    assert(math.abs(r._4 - idcg) < 1e-6)
    assert(math.abs(r._5 - 8.5 / idcg) < 1e-6)
    assert(r._6 == 1.0)          // first rel>=2 at pos 1
    assert(r._7 == 0.2)          // 2 relevant in top 10 / 10
  }

  test("ndcgAtK: no relevant docs gives null mrr; k cuts the list") {
    val df = Seq(("q", 1L, 1.0, 0.9), ("q", 2L, 1.0, 0.8))
      .toDF("q", "id", "rel", "s")
    val r = Ranking.ndcgAtK(df, "q", "id", "rel", "s", k = 1)
      .as[(String, Long, Double, Double, Double, Option[Double], Double)]
      .head()
    assert(r._6.isEmpty && r._7 == 0.0)
    // k=1: dcg = idcg = (2^1-1)/log2(2) = 1 → ndcg 1
    assert(r._3 == 1.0 && r._5 == 1.0)
  }
}
