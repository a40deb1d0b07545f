package graft.de

import graft.SparkSuite

class RobustStatsSpec extends SparkSuite {
  import spark.implicits._

  test("weightedMedian: hand-computed lower weighted median") {
    // values (weight): 1(1), 2(1), 3(4) — total 6, half 3 → cum at
    // v=2 is 2 (<3), at v=3 is 6 → median 3
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 4L))
      .toDF("grp", "v", "w")
    val r = RobustStats.weightedMedian(df, "grp", "v", "w")
      .collect().head
    assert(r.getAs[Long]("w_median") == 3L)
    assert(r.getAs[Long]("total_weight") == 6L)
    assert(r.getAs[Long]("n_values") == 3L)
  }

  test("weightedMedian: heavy small value pins the median low; " +
    "duplicate values merge their weights") {
    val df = Seq(("g", 1L, 10L), ("g", 1L, 10L), ("g", 100L, 5L))
      .toDF("grp", "v", "w")
    val r = RobustStats.weightedMedian(df, "grp", "v", "w")
      .collect().head
    assert(r.getAs[Long]("w_median") == 1L)
    assert(r.getAs[Long]("n_values") == 2L)    // merged cells
    assert(r.getAs[Long]("total_weight") == 25L)
  }

  test("weightedMedian: exact half boundary takes the crossing value") {
    // 2(1), 5(1): cum at 2 is 1, 2*1 >= 2 → median 2 (lower median)
    val df = Seq(("g", 2L, 1L), ("g", 5L, 1L)).toDF("grp", "v", "w")
    assert(RobustStats.weightedMedian(df, "grp", "v", "w")
      .collect().head.getAs[Long]("w_median") == 2L)
  }

  test("weightedQuantiles generalizes the median and hits hand-" +
    "computed cut points") {
    // values (weights): 1(2), 2(2), 3(4), 10(2): tot 10
    // q25 → cum≥2.5 → 2; q50 → cum≥5 → 3(cum 8)... 2 has cum 4 <5 → 3
    // wait: cum(1)=2, cum(2)=4, cum(3)=8, cum(10)=10
    // q25: 100·cum ≥ 25·10=250 → cum≥2.5 → v=2; q50: cum≥5 → 3;
    // q80: cum≥8 → 3; q90: cum≥9 → 10
    val df = Seq(("g", 1L, 2L), ("g", 2L, 2L), ("g", 3L, 4L),
      ("g", 10L, 2L)).toDF("grp", "v", "w")
    val got = RobustStats.weightedQuantiles(df, "grp", "v", "w",
        Seq(25, 50, 80, 90)).collect()
      .map(r => r.getAs[Int]("q") -> r.getAs[Long]("value")).toMap
    assert(got == Map(25 -> 2L, 50 -> 3L, 80 -> 3L, 90 -> 10L))
    // q50 agrees with weightedMedian
    val wm = RobustStats.weightedMedian(df, "grp", "v", "w")
      .collect().head.getAs[Long]("w_median")
    assert(wm == got(50))
  }

  test("mode: plain majority and the smallest-value tie-break") {
    val df = (Seq.fill(3)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(2)(("b", "q")) ++ Seq.fill(2)(("b", "p")))
      .toDF("grp", "v")
    val m = RobustStats.mode(df, "grp", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("a").getAs[String]("mode_value") == "x")
    assert(m("a").getAs[Long]("mode_count") == 3L)
    assert(m("a").getAs[Long]("n_distinct") == 2L)
    // b: p and q tie at 2 → smallest value "p" wins
    assert(m("b").getAs[String]("mode_value") == "p")
  }

  test("pythagoreanMeans: AM >= GM >= HM, equality on constants") {
    val df = (Seq(("v", 2L), ("v", 8L)) ++ Seq(("c", 5L), ("c", 5L)))
      .toDF("grp", "x")
    val m = RobustStats.pythagoreanMeans(df, "grp", "x").collect()
      .map(r => r.getString(0) -> r).toMap
    // [2,8]: AM 5, GM 4, HM 3.2
    assert(m("v").getAs[Double]("am") == 5.0)
    assert(m("v").getAs[Double]("gm") == 4.0)
    assert(m("v").getAs[Double]("hm") == 3.2)
    assert(m("c").getAs[Double]("am") == 5.0)
    assert(m("c").getAs[Double]("gm") == 5.0)
    assert(m("c").getAs[Double]("hm") == 5.0)
  }
}
