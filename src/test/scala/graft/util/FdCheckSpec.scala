package graft.util

import graft.SparkSuite

class FdCheckSpec extends SparkSuite {
  import spark.implicits._

  test("fdCheck: holding and violated dependencies with repair counts") {
    // a->b: key 1 maps to {x,x,y} (violating, 1 repair row),
    // key 2 maps to {z} (clean)
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "z")).toDF("a", "b")
    val r = Profile.fdCheck(df, "a", "b")
      .as[(Long, Long, Long, Boolean)].head()
    assert(r == ((2L, 1L, 1L, false)))
    val clean = Seq((1, "x"), (1, "x"), (2, "y")).toDF("a", "b")
    val rc = Profile.fdCheck(clean, "a", "b")
      .as[(Long, Long, Long, Boolean)].head()
    assert(rc == ((2L, 0L, 0L, true)))
  }

  test("fdCheck: null keys and values are excluded") {
    val df = Seq((Some(1), Some("x")), (Some(1), None), (None, Some("y")))
      .toDF("a", "b")
    val r = Profile.fdCheck(df, "a", "b")
      .as[(Long, Long, Long, Boolean)].head()
    assert(r == ((1L, 0L, 0L, true)))
  }
}
