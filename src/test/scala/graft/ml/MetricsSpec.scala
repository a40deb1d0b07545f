package graft.ml

import graft.SparkSuite

class MetricsSpec extends SparkSuite {
  import spark.implicits._

  // y: a a a b b c ; p: a a b b b a
  private val pairs = Seq(("a", "a"), ("a", "a"), ("a", "b"),
    ("b", "b"), ("b", "b"), ("c", "a")).toDF("y", "p")

  test("classificationReport: hand-computed per-class cells") {
    val m = Metrics.classificationReport(pairs, "y", "p").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = m("a")
    assert(a.getAs[Long]("support") == 3L)
    assert(a.getAs[Long]("tp") == 2L)
    assert(a.getAs[Long]("fp") == 1L)     // the c→a miss
    assert(a.getAs[Long]("fn") == 1L)
    // precision 2/3, recall 2/3, f1 2·2/(3+3)
    assert(a.getAs[Double]("precision") == 0.6667)
    assert(a.getAs[Double]("recall") == 0.6667)
    assert(a.getAs[Double]("f1") == 0.6667)
    val c = m("c")
    assert(c.getAs[Long]("tp") == 0L)
    assert(c.isNullAt(c.fieldIndex("precision")))  // never predicted
    assert(c.getAs[Double]("recall") == 0.0)
  }

  test("agreement: hand-computed accuracy, kappa, macro-F1") {
    val r = Metrics.agreement(pairs, "y", "p").collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("accuracy") ==
      math.rint(4.0 / 6 * 1e4) / 1e4)
    // margins: y a=3 b=2 c=1; p a=3 b=3 c=0 → pe = (9+6+0)/36
    assert(r.getAs[Double]("expected_agreement") ==
      math.rint(15.0 / 36 * 1e4) / 1e4)
    val kappa = (4.0 / 6 - 15.0 / 36) / (1.0 - 15.0 / 36)
    assert(math.abs(r.getAs[Double]("cohens_kappa") - kappa) < 1e-3)
    // macro-F1 over true classes a, b, c with rounded per-class f1
    val f1a = 0.6667; val f1b = 2.0 * 2 / 5; val f1c = 0.0
    assert(math.abs(r.getAs[Double]("macro_f1") -
      (f1a + f1b + f1c) / 3) < 1e-3)
  }

  test("perfect agreement: kappa 1; constant prediction: kappa <= 0") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("y", "p")
    assert(Metrics.agreement(perfect, "y", "p").collect().head
      .getAs[Double]("cohens_kappa") == 1.0)
    val const = Seq(("x", "x"), ("y", "x"), ("x", "x")).toDF("y", "p")
    val k = Metrics.agreement(const, "y", "p").collect().head
    assert(k.getAs[Double]("cohens_kappa") <= 0.0)
  }

  test("degenerate single-class both sides: kappa null (pe = 1)") {
    val degenerate = Seq(("x", "x"), ("x", "x")).toDF("y", "p")
    val r = Metrics.agreement(degenerate, "y", "p").collect().head
    assert(r.isNullAt(r.fieldIndex("cohens_kappa")))
    assert(r.getAs[Double]("accuracy") == 1.0)
  }

  test("weightedKappa: hand-computed linear and quadratic") {
    // cells (0,0) (0,1) (1,1) (1,0) (2,2)×2; uniform margins 2/2/2
    val ord = Seq((0, 0), (0, 1), (1, 1), (1, 0), (2, 2), (2, 2))
      .toDF("ra", "rb")
    val r = Metrics.weightedKappa(ord, "ra", "rb").collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("n_categories") == 3L)
    // ol=2 el=32 → 1−2·6/32 = 0.625 ; oq=2 eq=48 → 1−2·6/48 = 0.75
    assert(r.getAs[Double]("kappa_linear") == 0.625)
    assert(r.getAs[Double]("kappa_quadratic") == 0.75)
  }

  test("weightedKappa: perfect agreement is 1, single category null") {
    val perfect = Seq((0, 0), (1, 1), (2, 2)).toDF("ra", "rb")
    val p = Metrics.weightedKappa(perfect, "ra", "rb").collect().head
    assert(p.getAs[Double]("kappa_linear") == 1.0)
    assert(p.getAs[Double]("kappa_quadratic") == 1.0)
    val degen = Seq((1, 1), (1, 1)).toDF("ra", "rb")
    val d = Metrics.weightedKappa(degen, "ra", "rb").collect().head
    assert(d.isNullAt(d.fieldIndex("kappa_linear")))
  }

  test("mccPanel: hand-computed R_K, balanced accuracy") {
    val r = Metrics.mccPanel(pairs, "y", "p").collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("accuracy") == 0.6667)
    // recalls: a 2/3, b 1, c 0 → (2/3+1+0)/3 = 5/9
    assert(r.getAs[Double]("balanced_accuracy") ==
      math.rint(5.0 / 9 * 1e4) / 1e4)
    // (c·s − Σtp̂) / √((s²−Σp²)(s²−Σt²)) = 9/√(18·22)
    assert(r.getAs[Double]("mcc") ==
      math.rint(9.0 / math.sqrt(396.0) * 1e4) / 1e4)
  }

  test("mccPanel: all-one-class prediction nulls mcc") {
    val onePred = Seq(("a", "a"), ("b", "a"), ("c", "a")).toDF("y", "p")
    val r = Metrics.mccPanel(onePred, "y", "p").collect().head
    assert(r.isNullAt(r.fieldIndex("mcc")))
    assert(r.getAs[Double]("accuracy") == 0.3333)
  }
}
