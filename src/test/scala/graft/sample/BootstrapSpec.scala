package graft.sample

import graft.SparkSuite

class BootstrapSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq.tabulate(40)(i => ("g", (i * 37 % 100).toLong))
    .toDF("grp", "v")

  test("CI brackets the point mean and is ordered") {
    val r = Bootstrap.meanCi(df, "grp", "v", bReps = 50).collect().head
    val (lo, m, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("mean"),
      r.getAs[Double]("ci_hi"))
    assert(lo <= m && m <= hi)
    assert(r.getAs[Long]("n_units") == 40L)
    assert(r.getAs[Long]("b_reps") == 50L)
  }

  test("deterministic: identical results across independent runs") {
    val a = Bootstrap.meanCi(df, "grp", "v", bReps = 50).collect().head
    val b = Bootstrap.meanCi(df, "grp", "v", bReps = 50).collect().head
    assert(a == b)
  }

  test("degenerate data: CI collapses to the constant") {
    val const = Seq.fill(10)(("g", 7L)).toDF("grp", "v")
    val r = Bootstrap.meanCi(const, "grp", "v", bReps = 20).collect().head
    assert(r.getAs[Double]("ci_lo") == 7.0)
    assert(r.getAs[Double]("ci_hi") == 7.0)
    assert(r.getAs[Double]("mean") == 7.0)
  }

  test("groups resample independently: adding a group leaves the " +
    "other's CI unchanged") {
    val two = df.union(Seq.tabulate(10)(i => ("h", i.toLong)).toDF("grp", "v"))
    val solo = Bootstrap.meanCi(df, "grp", "v", bReps = 50).collect()
      .head
    val joint = Bootstrap.meanCi(two, "grp", "v", bReps = 50).collect()
      .filter(_.getString(0) == "g").head
    assert(solo == joint)
  }

  test("size dispatch: broadcast and hash-partitioned unit joins " +
    "produce identical CIs") {
    // broadcastUnitRows = 0 forces the shuffle path the dispatch takes
    // past broadcast range; the draws are hash-deterministic, so the
    // two plans must agree bit-for-bit (the BhParity pattern).
    val hinted = Bootstrap.meanCi(df, "grp", "v", bReps = 50)
      .collect().head
    val shuffled = Bootstrap.meanCi(df, "grp", "v", bReps = 50,
        broadcastUnitRows = 0L)
      .collect().head
    assert(hinted == shuffled)
  }

  test("wider data spread widens the interval") {
    val narrow = Seq.tabulate(30)(i => ("g", 100L + i % 3)).toDF("grp", "v")
    val wide = Seq.tabulate(30)(i => ("g", 100L + (i % 3) * 200)).toDF("grp", "v")
    val rn = Bootstrap.meanCi(narrow, "grp", "v", bReps = 50).collect().head
    val rw = Bootstrap.meanCi(wide, "grp", "v", bReps = 50).collect().head
    val wN = rn.getAs[Double]("ci_hi") - rn.getAs[Double]("ci_lo")
    val wW = rw.getAs[Double]("ci_hi") - rw.getAs[Double]("ci_lo")
    assert(wW > wN)
  }
}
