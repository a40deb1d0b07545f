package graft.de

import graft.SparkSuite

class MultiRaterSpec extends SparkSuite {
  import spark.implicits._

  // items: {a,a}, {a,b}, {b,b} — 2 raters each
  private val ratings = Seq((1L, "a"), (1L, "a"), (2L, "a"),
    (2L, "b"), (3L, "b"), (3L, "b")).toDF("item", "cat")

  test("fleissKappa: hand-computed P-bar, P-e, kappa") {
    val r = Agreement.fleissKappa(ratings, "item", "cat").head()
    assert(r.getAs[Long]("n_items") == 3L)
    assert(r.getAs[Long]("n_raters") == 2L)
    assert(r.getAs[Double]("p_bar") == 0.6667)   // (1 + 0 + 1)/3
    assert(r.getAs[Double]("p_e") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.3333)
  }

  test("fleissKappa: ragged designs null out; perfect agreement " +
    "is 1") {
    val ragged = ratings.union(Seq((1L, "a")).toDF("item", "cat"))
    val r = Agreement.fleissKappa(ragged, "item", "cat").head()
    assert(r.isNullAt(r.fieldIndex("kappa")))
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("item", "cat")
    assert(Agreement.fleissKappa(perfect, "item", "cat").head()
      .getAs[Double]("kappa") == 1.0)
  }

  test("krippendorffAlpha: hand-computed coincidence masses; " +
    "single-rating items drop") {
    val r = Agreement.krippendorffAlpha(ratings, "item", "cat").head()
    assert(r.getAs[Double]("d_o") == 2.0)
    assert(r.getAs[Double]("d_e") == 3.6)   // (36 − 18)/5
    assert(r.getAs[Double]("alpha") ==
      math.rint((1.0 - 2.0 / 3.6) * 1e4) / 1e4)
    // a lone extra rating on a new item carries no pairs → unchanged
    val plus = ratings.union(Seq((9L, "a")).toDF("item", "cat"))
    val p = Agreement.krippendorffAlpha(plus, "item", "cat").head()
    assert(p.getAs[Long]("n_items") == 3L)
    assert(p.getAs[Double]("alpha") == r.getAs[Double]("alpha"))
  }

  test("gwetAc1: hand values, and the prevalence paradox it fixes") {
    // balanced data: e(γ) = (1 − .5)/(2−1) = .5 → AC1 = κ = 1/3
    val r = Agreement.gwetAc1(ratings, "item", "cat").head()
    assert(r.getAs[Double]("p_bar") == 0.6667)
    assert(r.getAs[Double]("p_e_gamma") == 0.5)
    assert(r.getAs[Double]("ac1") == 0.3333)
    // extreme prevalence: 9 unanimous "ok" items + 1 split item.
    // κ collapses (P̄e ≈ .9) while AC1 stays high — the paradox.
    val skew = ((1 to 9).flatMap(i => Seq((i.toLong, "ok"),
      (i.toLong, "ok"))) ++ Seq((10L, "ok"), (10L, "bad")))
      .toDF("item", "cat")
    val k = Agreement.fleissKappa(skew, "item", "cat").head()
    val g = Agreement.gwetAc1(skew, "item", "cat").head()
    assert(g.getAs[Double]("ac1") > 0.85)
    assert(k.getAs[Double]("kappa") < 0.0)
  }

  test("krippendorffAlpha: one category gives null alpha (no " +
    "expected disagreement)") {
    val one = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("item", "cat")
    val r = Agreement.krippendorffAlpha(one, "item", "cat").head()
    assert(r.isNullAt(r.fieldIndex("alpha")))
    assert(r.getAs[Double]("d_o") == 0.0)
  }
}
