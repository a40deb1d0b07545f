package graft.events

import graft.SparkSuite

class LtvSpec extends SparkSuite {
  import spark.implicits._

  test("ltvMatrix: cumulative per-member value by cohort age") {
    // cohort 2020: users 1, 2. u1 spends 1000c y2020, 500c y2021;
    // u2 spends 3000c y2020. cohort 2021: user 3 spends 400c y2021.
    val df = Seq(
      (1L, 2020, 1000L), (1L, 2021, 500L),
      (2L, 2020, 3000L), (3L, 2021, 400L))
      .toDF("k", "y", "cents")
    val r = Cohorts.ltvMatrix(df, "k", "y", "cents")
      .orderBy("cohort", "age")
      .as[(Int, Int, Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (2020, 0, 2L, 4000L, 4000L, 20.0),
      (2020, 1, 2L, 500L, 4500L, 22.5),
      (2021, 0, 1L, 400L, 400L, 4.0)))
  }

  test("ltvMatrix: age gaps keep cumulative monotone") {
    val df = Seq((1L, 2020, 100L), (1L, 2023, 300L)).toDF("k", "y", "c")
    val r = Cohorts.ltvMatrix(df, "k", "y", "c")
      .orderBy("age").as[(Int, Int, Long, Long, Long, Double)]
      .collect().toSeq
    assert(r == Seq((2020, 0, 1L, 100L, 100L, 1.0),
      (2020, 3, 1L, 300L, 400L, 4.0)))
  }
}
