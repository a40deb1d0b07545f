package graft.join

import graft.SparkSuite

class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  // 10k rows of one hot key + a tail of distinct keys
  private lazy val large = ((1 to 10000).map(i => (1L, s"hot$i")) ++
    (2 to 50).map(i => (i.toLong, s"cold$i"))).toDF("k", "payload")
  private lazy val small = Seq((1L, "dim1"), (2L, "dim2"), (99L, "dim99"))
    .toDF("k", "attr")

  test("salted inner join equals plain inner join") {
    val plain = large.join(small, Seq("k"))
      .as[(Long, String, String)].collect().sorted
    val salted = SkewJoin.saltedJoin(large, small, "k", salts = 8)
      .as[(Long, String, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 10001)   // 10000 hot matches + cold k=2
  }

  test("salted left join keeps unmatched rows once") {
    val plain = large.join(small, Seq("k"), "left")
      .as[(Long, String, Option[String])].collect().sorted
    val salted = SkewJoin.saltedJoin(large, small, "k", salts = 8, "left")
      .as[(Long, String, Option[String])].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("map-typed columns on the large side do not break the salt hash") {
    val withMap = large.withColumn("meta",
      org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("k"), $"payload"))
    val plain = withMap.join(small, Seq("k")).count()
    val salted = SkewJoin.saltedJoin(withMap, small, "k", salts = 4).count()
    assert(salted == plain)
  }

  test("hot key spreads across multiple salt values") {
    val nSalts = SkewJoin.saltedJoin(large, small, "k", salts = 8)
      .filter($"k" === 1L)
      .select(org.apache.spark.sql.functions.spark_partition_id())
      .distinct().count()
    assert(nSalts > 1, "hot key must not land in a single partition")
  }
}
