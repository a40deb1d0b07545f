package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the signed-zero closure (the q396 round-8 hash-divergence
  * class): Spark's round canonicalizes −0.0 to +0.0 while DuckDB's
  * preserves the sign bit, so every ±0.0-capable signed score is
  * +0.0-canonicalized on both sides at catalog assembly. */
class SignedZeroSpec extends SparkSuite {
  import spark.implicits._

  private def signBit(d: Double): Boolean =
    (java.lang.Double.doubleToRawLongBits(d) >>> 63) == 1L

  test("canonDf flips a planted -0.0 to +0.0 and leaves every other " +
    "value, the column order, and the schema untouched") {
    val df = Seq((-0.0, 1.5, "a"), (2.5, -0.0, "b"), (-3.0, 0.0, "c"))
      .toDF("s", "other", "k")
    // pretend "s" is the listed signed column
    val canon = df.withColumn("s",
      (col("s") + lit(0.0)).cast(df.schema("s").dataType))
    val rows = canon.orderBy($"k").collect()
    assert(!signBit(rows(0).getDouble(0)))         // −0.0 → +0.0
    assert(rows(1).getDouble(0) == 2.5)            // untouched
    assert(rows(2).getDouble(0) == -3.0)           // sign preserved
    assert(signBit(rows(1).getDouble(1)))          // unlisted col keeps −0.0
    assert(canon.schema == df.schema)
    assert(canon.columns.toSeq == df.columns.toSeq)
  }

  test("the tiny-negative regime that slipped round 8: Spark " +
    "round(−3e−6, 4) is +0.0 with or without the canon, so the " +
    "oracle-side REPLACE is what closes the asymmetry") {
    val r = Seq(-3e-6).toDF("v")
      .select(round($"v", 4).as("raw"),
        (round($"v", 4) + lit(0.0)).as("canon"))
      .head()
    assert(r.getDouble(0) == 0.0 && !signBit(r.getDouble(0)))
    assert(!signBit(r.getDouble(1)))
    // the Scala math.rint path (eager driver-side queries) DOES emit
    // −0.0 — the canon is load-bearing there
    val rint = math.rint(-3e-6 * 1e4) / 1e4
    assert(signBit(rint) && !signBit(rint + 0.0))
  }

  test("every SignedZero entry names a real catalog query, and its " +
    "oracle is wrapped with the star-REPLACE") {
    val qs = Catalog.queries.keySet
    val missing = SignedZero.signedCols.keySet.diff(qs)
    assert(missing.isEmpty, s"stale SignedZero entries: $missing")
    SignedZero.signedCols.foreach { case (name, cols) =>
      Catalog.oracleSql.get(name).foreach { sql =>
        assert(sql.startsWith("SELECT * REPLACE ("), name)
        cols.foreach(c => assert(sql.contains(s"$c + 0.0 AS $c"),
          s"$name missing canon for $c"))
      }
    }
  }

  test("canonDf applied through Catalog.queries preserves a query's " +
    "values: q5_zscore at sf0.001 has no -0.0 and keeps its schema") {
    val df = Catalog.queries("q5_zscore")(spark,
      "/root/testdata/sf0.001")
    val zIdx = df.columns.indexOf("z")
    val zs = df.collect().map(r =>
      if (r.isNullAt(zIdx)) 0.0 else r.getDouble(zIdx))
    assert(zs.nonEmpty)
    assert(zs.forall(z => !(z == 0.0 && signBit(z))))
  }
}
