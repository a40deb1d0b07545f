package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** util.Quantiles must be BIT-identical to the `percentile` buffering
  * aggregate on every domain — it replaces that aggregate inside
  * operators whose outputs are hash-compared against the DuckDB
  * oracle, so even a 1-ulp interpolation difference is a correctness
  * regression, not a perf detail. */
class QuantilesSpec extends SparkSuite {
  import spark.implicits._

  private val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  private def check(df: DataFrame, tag: String,
                    fractions: Seq[Double] = ps): Unit = {
    val got = Quantiles.exactPercentiles(df, col("v"), fractions)
    val wantRow = df.select(col("v").cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .agg(percentile(col("__v"), array(fractions.map(lit): _*))).head()
    val want =
      if (wantRow.isNullAt(0)) None else Some(wantRow.getSeq[Double](0).toSeq)
    (got, want) match {
      case (None, None) => ()
      case (Some(g), Some(w)) =>
        g.zip(w).zip(fractions).foreach { case ((gv, wv), p) =>
          assert(java.lang.Double.compare(gv, wv) == 0,
            s"$tag p=$p: got $gv want $wv")
        }
      case _ => fail(s"$tag: presence mismatch got=$got want=$want")
    }
  }

  test("random doubles, several seeds and sizes (odd/even n)") {
    for (seed <- Seq(1, 2, 3); n <- Seq(101, 1000, 4096, 65537)) {
      val rnd = new scala.util.Random(seed)
      val data = Seq.fill(n)(rnd.nextDouble() * 2e6 - 1e6)
      check(data.toDF("v"), s"seed=$seed n=$n")
    }
  }

  test("heavy ties and integer grids") {
    val rnd = new scala.util.Random(7)
    check(Seq.fill(70000)(rnd.nextInt(5).toDouble).toDF("v"), "5 values")
    check(Seq.fill(3000)(42.0).toDF("v"), "constant")
    check((1 to 100000).map(_ % 997).map(_.toDouble).toDF("v"), "mod grid")
  }

  test("nulls ignored; empty and all-null give None") {
    val withNulls = (Seq.fill(500)(Option.empty[Double]) ++
      (1 to 80000).map(i => Some(i.toDouble))).toDF("v")
    check(withNulls, "nulls mixed")
    assert(Quantiles.exactPercentiles(
      Seq.empty[Double].toDF("v"), col("v"), Seq(0.5)).isEmpty)
    assert(Quantiles.exactPercentiles(
      Seq.fill(5)(Option.empty[Double]).toDF("v"), col("v"),
      Seq(0.5)).isEmpty)
  }

  test("non-finite domains take the identical aggregate fallback") {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(70000)(rnd.nextDouble() * 100)
    check((base :+ Double.NaN).toDF("v"), "NaN present")
    check((base :+ Double.PositiveInfinity).toDF("v"), "+Inf present")
    check((Double.NegativeInfinity +: base).toDF("v"), "-Inf present")
  }

  test("signed zero takes the aggregate fallback (±0.0 key merge)") {
    val data = Seq.fill(40000)(-0.0) ++ Seq.fill(40000)(0.0) ++
      Seq.fill(100)(-1.0) ++ Seq.fill(100)(1.0)
    check(data.toDF("v"), "signed zeros")
  }

  test("pathological concentration: outlier stretches the range") {
    // 99.99% of mass inside one 1/65536 slice of the min-max range →
    // the target bucket exceeds nothing at this n, but exercises the
    // narrowing recursion when CollectCap is crossed at larger n; at
    // this size it exercises dense-bucket selection.
    val rnd = new scala.util.Random(13)
    val tight = Seq.fill(90000)(1000.0 + rnd.nextDouble() * 1e-7)
    check((tight :+ 1e12).toDF("v"), "concentrated + outlier")
  }

  test("small inputs short-circuit to the aggregate") {
    check(Seq(3.0, 1.0, 2.0).toDF("v"), "n=3")
    check(Seq(5.5).toDF("v"), "n=1", Seq(0.0, 0.5, 1.0))
  }
}
