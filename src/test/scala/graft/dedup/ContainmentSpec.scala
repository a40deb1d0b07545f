package graft.dedup

import graft.SparkSuite

class ContainmentSpec extends SparkSuite {
  import spark.implicits._

  test("containmentPairs: planted excerpt scores ~1 toward its parent") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 10).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"u$i").mkString(" ")
    val df = Seq((1L, words), (2L, excerpt), (3L, other))
      .toDF("id", "text")
    val r = Dedup.containmentPairs(df, "id", "text", shingleSize = 3,
        minContainment = 0.5, maxShingleDf = 10L)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(r.length == 1)
    val p = r.head
    // excerpt has 8 shingles, all inside the parent's 38
    assert(p._1 == 1L && p._2 == 2L && p._3 == 8L && p._4 == 38L &&
      p._5 == 8L && p._7 == 1.0)
    assert(p._6 == math.rint(8.0 / 38 * 1e4) / 1e4)
  }

  test("containmentPairs: pairs sharing only hot shingles are skipped") {
    // the shared shingle appears in all 4 docs; maxShingleDf=3 prunes it
    val t1 = "x y z a b c"
    val df = (1L to 4L).map(i => (i, t1)).toDF("id", "text")
    val r = Dedup.containmentPairs(df, "id", "text", shingleSize = 3,
      minContainment = 0.5, maxShingleDf = 3L)
    assert(r.count() == 0L)
  }
}
