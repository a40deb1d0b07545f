package graft.util

import graft.SparkSuite

class ReconcileSpec extends SparkSuite {
  import spark.implicits._

  test("report: side-only keys, per-column and all-column mismatches") {
    val left = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "p", "s")
    val right = Seq((2L, 20.0, "b"), (3L, 31.0, "c"), (4L, 40.0, "d"))
      .toDF("k", "p", "s")
    val r = Reconcile.report(left, right, "k", Seq("p", "s"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    // left 3, right 3, left-only {1}, right-only {4}, both {2,3},
    // matching {2}, mismatched {3} (p only)
    assert(r == ((3L, 3L, 1L, 1L, 2L, 1L, 1L, 1L, 0L)))
  }

  test("report: null-key rows still count toward their side's total") {
    // a null key can never match (equi-join), but it must not vanish
    // from n_left/n_right — totals reconcile against input row counts
    val left = Seq((Some(1L), 10.0), (None: Option[Long], 99.0))
      .toDF("k", "p")
    val right = Seq((Some(1L), 10.0), (None: Option[Long], 88.0),
      (None: Option[Long], 77.0)).toDF("k", "p")
    val r = Reconcile.report(left, right, "k", Seq("p"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    // n_left=2, n_right=3, left_only=1 (the null row), right_only=2,
    // both=1, matching=1, mismatched=0
    assert(r == ((2L, 3L, 1L, 2L, 1L, 1L, 0L, 0L)))
  }

  test("report: null-vs-null matches, null-vs-value mismatches") {
    val left = Seq((1L, None: Option[Double]), (2L, Some(5.0)))
      .toDF("k", "p")
    val right = Seq((1L, None: Option[Double]), (2L, None: Option[Double]))
      .toDF("k", "p")
    val r = Reconcile.report(left, right, "k", Seq("p"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r._6 == 1L && r._7 == 1L && r._8 == 1L)
  }
}
