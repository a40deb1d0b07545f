package graft.ml

import graft.SparkSuite

class InfluenceSpec extends SparkSuite {
  import spark.implicits._

  // integer-valued columns (the determinism contract); source "c" is an
  // outlier slice that bends the slope
  private val df = Seq(
    ("a", 10.0, 1.0, 2.0), ("a", 14.0, 2.0, 2.0), ("a", 18.0, 3.0, 2.0),
    ("b", 22.0, 4.0, 3.0), ("b", 26.0, 5.0, 3.0), ("b", 30.0, 6.0, 3.0),
    ("c", 90.0, 7.0, 1.0), ("c", 95.0, 8.0, 1.0), ("c", 40.0, 9.0, 1.0)
  ).toDF("src", "y", "x1", "x2")

  test("looSourceOls2: each LOO row equals an actual refit without " +
    "that source") {
    val got = Influence.looSourceOls2(df, "src", "y", "x1", "x2")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(6))).toMap // b1_loo, r2_loo
    for (s <- Seq("a", "b", "c")) {
      val rest = df.filter($"src" =!= s)
        .select($"y".as("__y"), $"x1".as("__x1"), $"x2".as("__x2"))
      val beta = Regression.olsBeta(rest,
        org.apache.spark.sql.functions.lit(1.0)).get
      assert(approx(got(s)._1, math.rint(beta(1) * 1e4) / 1e4, 1e-9),
        s"b1_loo($s): ${got(s)._1} vs refit ${beta(1)}")
    }
    // full model identical on every row; n_source and deltas consistent
    val rows = Influence.looSourceOls2(df, "src", "y", "x1", "x2")
      .collect()
    assert(rows.map(_.getDouble(2)).distinct.length == 1) // b1_full
    rows.foreach { r =>
      assert(approx(r.getDouble(4), // b1_delta
        math.rint((r.getDouble(3) - r.getDouble(2)) * 1e4) / 1e4, 1e-3))
    }
    // the outlier slice "c" hurts fit: r2 improves without it
    val deltas = rows.map(r => r.getString(0) -> r.getDouble(7)).toMap
    assert(deltas("c") > 0, s"expected positive r2_delta for c: $deltas")
  }

  test("looSourceOls2: single-source input yields null LOO (no rows " +
    "left) without throwing") {
    val one = Seq(("only", 1.0, 1.0, 2.0), ("only", 2.0, 2.0, 1.0),
      ("only", 3.0, 3.0, 2.0)).toDF("src", "y", "x1", "x2")
    val r = Influence.looSourceOls2(one, "src", "y", "x1", "x2").collect()
    assert(r.length == 1 && r.head.isNullAt(3)) // b1_loo null
  }
}
