package graft.de

import graft.SparkSuite

class CountModelsSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed moments and NB fit") {
    // counts [2, 4, 6]: mean 4, var_samp 4, D 1, s2 == mu → no NB fit
    val eq = Seq(("a", 2L), ("a", 4L), ("a", 6L)).toDF("g", "c")
    val r1 = CountModels.overdispersion(eq, "g", "c").collect().head
    assert(r1.getAs[Double]("mean") == 4.0)
    assert(r1.getAs[Double]("variance") == 4.0)
    assert(r1.getAs[Double]("dispersion") == 1.0)
    assert(r1.isNullAt(r1.fieldIndex("nb_r")))
    // counts [0, 10]: mean 5, var 50, D 10, r = 25/45, p = 0.1
    val od = Seq(("b", 0L), ("b", 10L)).toDF("g", "c")
    val r2 = CountModels.overdispersion(od, "g", "c").collect().head
    assert(r2.getAs[Double]("dispersion") == 10.0)
    assert(r2.getAs[Double]("nb_r") ==
      math.rint(25.0 / 45 * 1e4) / 1e4)
    assert(r2.getAs[Double]("nb_p") == 0.1)
  }

  test("under-dispersed and degenerate series yield nulls, not fits") {
    val under = Seq(("u", 5L), ("u", 5L), ("u", 6L)).toDF("g", "c")
    val r = CountModels.overdispersion(under, "g", "c").collect().head
    assert(r.getAs[Double]("dispersion") < 1.0)
    assert(r.isNullAt(r.fieldIndex("nb_r")))
    val zero = Seq(("z", 0L), ("z", 0L)).toDF("g", "c")
    val rz = CountModels.overdispersion(zero, "g", "c").collect().head
    assert(rz.isNullAt(rz.fieldIndex("dispersion")))
  }
}
