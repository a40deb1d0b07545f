package graft.de

import graft.SparkSuite

class SurvivalSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed KM with censoring (classic 6-subject example)") {
    // durations (event): 1(d), 2(c), 3(d), 4(c), 5(d), 6(c)
    val df = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 0), (5L, 1), (6L, 0))
      .toDF("dur", "ev")
    val m = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getAs[Long]("t") -> r).toMap
    assert(m(1L).getAs[Long]("n_risk") == 6L)
    assert(m(1L).getAs[Double]("survival") == math.rint(5.0 / 6 * 1e6) / 1e6)
    // t=3: at risk 4, S = 5/6 · 3/4 = 0.625
    assert(m(3L).getAs[Long]("n_risk") == 4L)
    assert(m(3L).getAs[Double]("survival") == 0.625)
    // t=5: at risk 2, S = 0.625 · 1/2 = 0.3125
    assert(m(5L).getAs[Double]("survival") == 0.3125)
    // censor-only times keep the previous survival
    assert(m(2L).getAs[Double]("survival") ==
      m(1L).getAs[Double]("survival"))
    assert(m(6L).getAs[Long]("n_event") == 0L)
  }

  test("no events at all: survival stays 1.0 everywhere") {
    val df = Seq((3L, 0), (5L, 0), (5L, 0)).toDF("dur", "ev")
    val rows = Survival.kaplanMeier(df, "dur", "ev").collect()
    assert(rows.forall(_.getAs[Double]("survival") == 1.0))
    assert(rows.map(_.getAs[Long]("n_censored")).sum == 3L)
  }

  test("everyone dies at the last time: survival hits exactly 0") {
    val df = Seq((1L, 0), (2L, 1), (2L, 1)).toDF("dur", "ev")
    val m = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getAs[Long]("t") -> r.getAs[Double]("survival")).toMap
    assert(m(1L) == 1.0)
    assert(m(2L) == 0.0)
  }

  test("ties at one duration combine into one step") {
    // 4 subjects: two die at t=2 together, at-risk 4 → S = 2/4
    val df = Seq((2L, 1), (2L, 1), (3L, 0), (4L, 0)).toDF("dur", "ev")
    val m = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getAs[Long]("t") -> r).toMap
    assert(m(2L).getAs[Long]("n_event") == 2L)
    assert(m(2L).getAs[Long]("n_risk") == 4L)
    assert(m(2L).getAs[Double]("survival") == 0.5)
  }

  test("logRank: identical group curves give z = 0") {
    val df = (Seq(("A", 1L, 1), ("A", 2L, 0), ("A", 3L, 1)) ++
      Seq(("B", 1L, 1), ("B", 2L, 0), ("B", 3L, 1)))
      .toDF("grp", "dur", "ev")
    val r = Survival.logRank(df, "grp", "dur", "ev", "A", "B")
      .collect().head
    assert(r.getAs[Double]("z") == 0.0)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Long]("o_a") == 2L)
    // t=1: E += 2·3/6 = 1; t=3: E += 2·1/2 = 1
    assert(r.getAs[Double]("e_a") == 2.0)
  }

  test("logRank: hand-computed single event time") {
    // t=1: A has 2 at risk (1 death), B has 2 at risk (0 deaths)
    // E_a = 1·2/4 = .5; V = 1·(2/4)(2/4)(4-1)/(4-1) = .25
    // z = (1 − .5)/.5 = 1
    val df = (Seq(("A", 1L, 1), ("A", 5L, 0)) ++
      Seq(("B", 5L, 0), ("B", 5L, 0))).toDF("grp", "dur", "ev")
    val r = Survival.logRank(df, "grp", "dur", "ev", "A", "B")
      .collect().head
    assert(r.getAs[Double]("e_a") == 0.5)
    assert(r.getAs[Double]("z") == 1.0)
    assert(r.getAs[Double]("chi2") == 1.0)
  }

  test("logRank: no events anywhere gives null z; other groups ignored") {
    val df = (Seq(("A", 1L, 0), ("B", 2L, 0)) ++
      Seq(("C", 1L, 1), ("C", 2L, 1))).toDF("grp", "dur", "ev")
    val r = Survival.logRank(df, "grp", "dur", "ev", "A", "B")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.getAs[Long]("n_a") == 1L)
    assert(r.getAs[Long]("n_b") == 1L)
  }

  test("logRank: strongly divergent curves give a large statistic") {
    // A all die early, B all censored late
    val df = ((1 to 10).map(i => ("A", i.toLong, 1)) ++
      (1 to 10).map(_ => ("B", 20L, 0))).toDF("grp", "dur", "ev")
    val r = Survival.logRank(df, "grp", "dur", "ev", "A", "B")
      .collect().head
    assert(r.getAs[Double]("chi2") > 6.0)   // p << 0.05 territory
    assert(r.getAs[Double]("z") > 0)        // A over-observed vs expected
  }

  test("coxPh: closed-form three-subject MLE β = −½·ln 2") {
    // events at t=1 (x=1) and t=2 (x=0), censored x=1 at t=3:
    // U(β) = 0 ⇔ e^(2β) = 1/2
    val df = Seq((1.0, 1, 1.0), (2.0, 1, 0.0), (3.0, 0, 1.0))
      .toDF("t", "e", "x")
    val r = Survival.coxPh(df, "t", "e", "x").head()
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("n_events") == 2L)
    assert(r.getAs[Double]("beta") ==
      math.rint(-0.5 * math.log(2) * 1e4) / 1e4)
    assert(r.getAs[Double]("hazard_ratio") ==
      math.rint(math.exp(-0.5 * math.log(2)) * 1e4) / 1e4)
    assert(r.getAs[Double]("p_value") > 0.05)   // tiny n: no signal
  }

  test("coxPh: direction and degeneracy") {
    // x = 1 group dies much earlier → positive beta (hazard up)
    val df = ((1 to 10).map(i => (i.toDouble, 1, 1.0)) ++
      (11 to 20).map(i => (i.toDouble, 1, 0.0))).toDF("t", "e", "x")
    assert(Survival.coxPh(df, "t", "e", "x").head()
      .getAs[Double]("beta") > 0.5)
    // constant covariate: zero information → null fit
    val const = Seq((1.0, 1, 2.0), (2.0, 1, 2.0), (3.0, 0, 2.0))
      .toDF("t", "e", "x")
    val c = Survival.coxPh(const, "t", "e", "x").head()
    assert(c.isNullAt(c.fieldIndex("beta")))
    // no events at all: no partial likelihood
    val noe = Seq((1.0, 0, 1.0), (2.0, 0, 0.0)).toDF("t", "e", "x")
    val z = Survival.coxPh(noe, "t", "e", "x").head()
    assert(z.isNullAt(z.fieldIndex("beta")))
    assert(z.getAs[Long]("n_events") == 0L)
  }

  test("coxPh/logRank: continuous durations past the grain guard " +
    "fail fast; timeBuckets coarsens back under it") {
    // 500 distinct micro-grained durations vs a guard of 100
    val df = (1 to 500).map(i =>
      (i * 0.001, i % 2, if (i % 3 == 0) 1.0 else 0.0))
      .toDF("t", "e", "x")
    val e1 = intercept[IllegalArgumentException] {
      Survival.coxPh(df, "t", "e", "x", maxDistinctTimes = 100L)
        .head()
    }
    assert(e1.getMessage.contains("timeBuckets"))
    val e2 = intercept[IllegalArgumentException] {
      val g = df.withColumn("grp",
        org.apache.spark.sql.functions.when($"x" > 0, "A")
          .otherwise("B"))
      Survival.logRank(g, "grp", "t", "e", "A", "B",
        maxDistinctTimes = 100L).head()
    }
    assert(e2.getMessage.contains("distinct durations"))
    // bucketing brings the grain under the same guard and still fits
    val r = Survival.coxPh(df, "t", "e", "x", timeBuckets = 50,
      maxDistinctTimes = 100L).head()
    assert(r.getAs[Long]("n") == 500L)
    assert(!r.isNullAt(r.fieldIndex("beta")))
  }
}
