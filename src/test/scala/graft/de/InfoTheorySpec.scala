package graft.de

import graft.SparkSuite

class InfoTheorySpec extends SparkSuite {
  import spark.implicits._

  test("independent uniform columns: MI = 0") {
    // x in {a,b} × y in {u,v}, every cell count 2 — exactly independent
    val df = Seq(("a", "u"), ("a", "u"), ("a", "v"), ("a", "v"),
      ("b", "u"), ("b", "u"), ("b", "v"), ("b", "v")).toDF("x", "y")
    val r = InfoTheory.mutualInformation(df, "x", "y").collect().head
    assert(r.getAs[Double]("mi") == 0.0)
    assert(r.getAs[Double]("h_x") == math.rint(math.log(2) * 1e6) / 1e6)
    assert(r.getAs[Double]("nmi") == 0.0)
  }

  test("perfectly dependent columns: MI = H(X) = H(Y), NMI = 1") {
    val df = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v"))
      .toDF("x", "y")
    val r = InfoTheory.mutualInformation(df, "x", "y").collect().head
    assert(r.getAs[Double]("mi") == r.getAs[Double]("h_x"))
    assert(r.getAs[Double]("h_xy") == r.getAs[Double]("h_x"))
    assert(r.getAs[Double]("nmi") == 1.0)
  }

  test("hand-computed asymmetric table") {
    // cells: (a,u)=2 (a,v)=1 (b,v)=1; N=4
    val df = Seq(("a", "u"), ("a", "u"), ("a", "v"), ("b", "v"))
      .toDF("x", "y")
    val r = InfoTheory.mutualInformation(df, "x", "y").collect().head
    val n = 4.0
    def h(cs: Seq[Double]) = math.log(n) - cs.map(c => c * math.log(c)).sum / n
    val hx = h(Seq(3, 1)); val hy = h(Seq(2, 2)); val hxy = h(Seq(2, 1, 1))
    assert(approx(r.getAs[Double]("h_x"), hx, 1e-5))
    assert(approx(r.getAs[Double]("h_y"), hy, 1e-5))
    assert(approx(r.getAs[Double]("mi"), hx + hy - hxy, 1e-5))
    assert(r.getAs[Long]("n_cells") == 3L)
  }

  test("degenerate axis: zero entropy, null NMI") {
    val df = Seq(("a", "u"), ("a", "v")).toDF("x", "y")
    val r = InfoTheory.mutualInformation(df, "x", "y").collect().head
    assert(r.getAs[Double]("h_x") == 0.0)
    assert(r.isNullAt(r.fieldIndex("nmi")))
  }
}
