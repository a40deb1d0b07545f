package graft.join

import graft.SparkSuite

class SkewStatsSpec extends SparkSuite {
  import spark.implicits._

  test("keySkew reports the exact distribution numbers") {
    // key "a": 6 rows, "b": 2, "c": 2 -> 10 rows over 3 keys
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map(_.swap).toDF("id", "k")
    val r = SkewStats.keySkew(df, "k").collect()(0)
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("max_rows_per_key") == 6L)
    assert(approx(r.getAs[Double]("avg_rows_per_key"), 10.0 / 3, 1e-4))
    assert(approx(r.getAs[Double]("skew_ratio"), 6.0 / (10.0 / 3), 1e-4))
    assert(r.getAs[String]("hot_key") == "a")
  }

  test("keySkew hot_key tie-break: largest key among max-count ties") {
    val df = Seq((1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "z"))
      .toDF("id", "k")
    val r = SkewStats.keySkew(df, "k").collect()(0)
    assert(r.getAs[Long]("max_rows_per_key") == 2L)
    assert(r.getAs[String]("hot_key") == "y", "ties resolve to largest key")
  }
}
