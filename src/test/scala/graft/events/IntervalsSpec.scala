package graft.events

import graft.SparkSuite

class IntervalsSpec extends SparkSuite {
  import spark.implicits._

  test("mergeIntervals: containment that lag(end) would get wrong") {
    // Key a: [0,100) contains [10,20) and [30,40); [90,150) overlaps the
    // running max (100) even though the PREVIOUS row's end is 40 — a
    // lag-based break flag would wrongly split here. [200,210) is a new
    // island. Key b: [10,20) and [20,30) touch (start == running max end),
    // which merges under half-open semantics; [40,50) stays separate.
    val iv = Seq(
      ("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L),
      ("a", 90L, 150L), ("a", 200L, 210L),
      ("b", 10L, 20L), ("b", 20L, 30L), ("b", 40L, 50L)
    ).toDF("k", "s", "e")
    val got = Intervals.mergeIntervals(iv, "k", "s", "e")
      .select("k", "s", "e").as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 0L, 150L), ("a", 200L, 210L),
      ("b", 10L, 30L), ("b", 40L, 50L)))
  }

  test("mergeIntervals: slack joins near-adjacent islands") {
    val iv = Seq(("k", 0L, 10L), ("k", 15L, 20L), ("k", 40L, 50L))
      .toDF("k", "s", "e")
    val got = Intervals.mergeIntervals(iv, "k", "s", "e", slack = 5L)
      .select("s", "e").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 20L), (40L, 50L)))
  }

  test("coverageStats: per-key island stats") {
    val iv = Seq(
      ("a", 0L, 100L), ("a", 90L, 150L), ("a", 200L, 210L),
      ("b", 5L, 6L)
    ).toDF("k", "s", "e")
    val got = Intervals.coverageStats(iv, "k", "s", "e")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((2L, 160L, 150L)))
    assert(got("b") == ((1L, 1L, 1L)))
  }

  test("interArrivalExpFit: hand-computed KS distance vs fitted " +
    "exponential") {
    // one key, events at 0/10/20/40 s -> gaps 10,10,20; mean 13.3333
    // F(10) = 1 - e^-0.75 = .527633; F(20) = 1 - e^-1.5 = .776870
    // D = max over i of two-sided distances = |0/3 - F(10)| = .5276
    import java.sql.Timestamp
    def ts(sec: Int) = new Timestamp(1704067200000L + sec * 1000L)
    val ev = Seq(("k", ts(0), 1L), ("k", ts(10), 2L),
      ("k", ts(20), 3L), ("k", ts(40), 4L)).toDF("k", "ts", "id")
    val r = Intervals.interArrivalExpFit(ev, "k", "ts", "id").head()
    assert(r.getAs[Long]("n_gaps") == 3L)
    assert(r.getAs[Double]("mean_gap_sec") == 13.3333)
    assert(r.getAs[Double]("rate_per_hour") == 270.0)
    assert(r.getAs[Double]("ks_d") == 0.5276)
  }

  test("maxConcurrency: sweep line with end-exclusive semantics") {
    // (1,5),(2,6),(5,7): at t=5 the first ends BEFORE the third
    // starts, so the peak is 2 (first reached at t=2), never 3
    val iv = Seq(("k", 1L, 5L), ("k", 2L, 6L), ("k", 5L, 7L))
      .toDF("k", "s", "e")
    val r = Intervals.maxConcurrency(iv, "k", "s", "e").head()
    assert(r.getAs[Long]("n_intervals") == 3L)
    assert(r.getAs[Long]("peak") == 2L)
    assert(r.getAs[Long]("peak_at") == 2L)
  }

  test("allenRelations: the full 13-relation taxonomy on a pinned set") {
    val iv = Seq((1L, 1L, 3L), (2L, 3L, 5L), (3L, 1L, 5L),
      (4L, 6L, 7L), (5L, 2L, 3L))
      .map { case (id, s, e) => ("k", id, s, e) }.toDF("k", "id", "s", "e")
    val got = Intervals.allenRelations(iv, "k", "id", "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getString(3))
      .toMap
    assert(got((1L, 2L)) == "meets")
    assert(got((1L, 3L)) == "starts")
    assert(got((1L, 4L)) == "before")
    assert(got((1L, 5L)) == "finishes_inv")
    assert(got((2L, 3L)) == "finishes")
    assert(got((2L, 5L)) == "meets_inv")
    assert(got((3L, 5L)) == "during_inv")
    assert(got((4L, 5L)) == "before_inv")
    assert(got.size == 10)
  }

  test("allenRelations: overlaps both ways") {
    val iv = Seq((1L, 1L, 4L), (2L, 2L, 6L), (3L, 0L, 2L))
      .map { case (id, s, e) => ("k", id, s, e) }.toDF("k", "id", "s", "e")
    val got = Intervals.allenRelations(iv, "k", "id", "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getString(3))
      .toMap
    assert(got((1L, 2L)) == "overlaps")
    assert(got((1L, 3L)) == "overlaps_inv")
  }

  test("interArrivalExpFit: keys with under 3 gaps drop out") {
    import java.sql.Timestamp
    def ts(sec: Int) = new Timestamp(1704067200000L + sec * 1000L)
    val ev = Seq(("k", ts(0), 1L), ("k", ts(5), 2L)).toDF("k", "ts", "id")
    assert(Intervals.interArrivalExpFit(ev, "k", "ts", "id").count() == 0)
  }
}
