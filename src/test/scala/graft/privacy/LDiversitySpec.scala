package graft.privacy

import graft.SparkSuite

class LDiversitySpec extends SparkSuite {
  import spark.implicits._

  test("lDiversity: homogeneous class flagged, diverse class passes") {
    val df = Seq(
      ("x", "s1"), ("x", "s1"), ("x", "s1"),     // class x: l = 1
      ("y", "s1"), ("y", "s2"), ("y", "s3"))     // class y: l = 3
      .toDF("qi", "sens")
    val r = LDiversity_run(df)
    assert(r == Seq(("x", 3L, 1L, false, 1L), ("y", 3L, 3L, true, 1L)))
  }

  private def LDiversity_run(df: org.apache.spark.sql.DataFrame) =
    Privacy.lDiversity(df, Seq("qi"), "sens", l = 2)
      .orderBy("qi")
      .as[(String, Long, Long, Boolean, Long)].collect().toSeq

  test("lDiversity: null sensitive values count per countDistinct rules") {
    // countDistinct ignores nulls: class z has values {s1, null} → l=1
    val df = Seq(("z", Some("s1")), ("z", None)).toDF("qi", "sens")
    val r = LDiversity_run(df)
    assert(r == Seq(("z", 2L, 1L, false, 1L)))
  }
}
