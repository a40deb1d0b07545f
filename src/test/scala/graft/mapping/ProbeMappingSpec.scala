package graft.mapping

import graft.SparkSuite

class ProbeMappingSpec extends SparkSuite {

  test("golden mapping csv loads; blank symbols dropped; last duplicate wins") {
    import spark.implicits._
    val m = ProbeMapping.loadMappingCsv(spark, resource("tiny_probe_mapping.csv"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("1007_s_at" -> "DDR1", "1053_at" -> "RFC2",
      "117_at" -> "HSPA6", "121_at" -> "PAX8", "1255_g_at" -> "GUCA1A",
      "1294_at" -> "UBA7", "1316_at" -> "THRA"))
  }

  test("collapseToGenes: inner join drops unmapped; per-gene median over probes") {
    import spark.implicits._
    val expr = Seq(
      ("p1", "s1", 1.0), ("p1", "s2", 2.0),
      ("p2", "s1", 3.0), ("p2", "s2", 4.0),
      ("p3", "s1", 9.0), ("p3", "s2", 9.0),   // unmapped -> dropped (F3)
      ("p4", "s1", 5.0), ("p4", "s2", 6.0))
      .toDF("probe_id", "sample_id", "value")
    val mapping = Seq(("p1", "G1"), ("p2", "G1"), ("p4", "G2"))
      .toDF("probe_id", "symbol")
    val out = ProbeMapping.collapseToGenes(expr, mapping).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out == Map(
      ("G1", "s1") -> 2.0, ("G1", "s2") -> 3.0,   // median(1,3), median(2,4)
      ("G2", "s1") -> 5.0, ("G2", "s2") -> 6.0))
  }

  test("duplicate PROBEID keeps last csv occurrence (dict semantics)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-map").toFile
    val f = new java.io.File(tmp, "dup.csv")
    java.nio.file.Files.writeString(f.toPath,
      "PROBEID,SYMBOL\np1,OLD\np1,NEW\np2,KEEP\np3,\n")
    val m = ProbeMapping.loadMappingCsv(spark, f.getPath)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("p1" -> "NEW", "p2" -> "KEEP"))   // p3 blank dropped
  }

  test("multi-file mapping dir: last occurrence keyed by (file, line), not listing order") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-map2")
    // written in REVERSE name order so any listing-order dependence that
    // happens to follow creation order would flip the winner
    java.nio.file.Files.writeString(tmp.resolve("b_second.csv"),
      "PROBEID,SYMBOL\npX,FROM_B\npB,ONLY_B\n")
    java.nio.file.Files.writeString(tmp.resolve("a_first.csv"),
      "PROBEID,SYMBOL\npX,FROM_A\npA,ONLY_A\n")
    val m = ProbeMapping.loadMappingCsv(spark, tmp.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("pX" -> "FROM_B", "pA" -> "ONLY_A", "pB" -> "ONLY_B"))
  }
}
