package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the signed-zero closure (the q396 round-8 hash-divergence
  * class): Spark's round canonicalizes −0.0 to +0.0 while DuckDB's
  * preserves the sign bit. Round 10 closed the class STRUCTURALLY:
  * [[SignedZero.canonDf]] canonicalizes EVERY double output column
  * (schema-derived — no enumerated map to go stale), and
  * [[SignedZero.canonSql]] mirrors it on the oracle from the
  * generated registry; CatalogPlanAuditSpec pins registry freshness
  * against every query's live schema. */
class SignedZeroSpec extends SparkSuite {
  import spark.implicits._

  private def signBit(d: Double): Boolean =
    (java.lang.Double.doubleToRawLongBits(d) >>> 63) == 1L

  test("canonDf closes a planted -0.0 in a column NO map ever " +
    "enumerated, and leaves every other value, the column order, and " +
    "the schema untouched") {
    val df = Seq((-0.0, 1.5, "a", -0.0), (2.5, -0.0, "b", 0.25),
      (-3.0, 0.0, "c", 1.0))
      .toDF("never_enumerated", "other", "k", "w")
    val canon = SignedZero.canonDf(df)
    val rows = canon.orderBy($"k").collect()
    assert(!signBit(rows(0).getDouble(0)))      // −0.0 → +0.0, col 1
    assert(!signBit(rows(1).getDouble(1)))      // −0.0 → +0.0, col 2
    assert(!signBit(rows(0).getDouble(3)))      // −0.0 → +0.0, col 4
    assert(rows(1).getDouble(0) == 2.5)         // untouched
    assert(rows(2).getDouble(0) == -3.0)        // sign preserved
    assert(rows(2).getDouble(3) == 1.0)
    assert(canon.schema == df.schema)
    assert(canon.columns.toSeq == df.columns.toSeq)
  }

  test("canonDf canonicalizes array<double> elements and NaN/null " +
    "survive untouched") {
    val df = Seq(
      (1, Seq(-0.0, 1.5, -2.0), Option(Double.NaN)),
      (2, Seq(0.0, -0.0), None))
      .toDF("id", "xs", "v")
    val canon = SignedZero.canonDf(df)
    assert(canon.schema == df.schema)
    val rows = canon.orderBy($"id").collect()
    val xs0 = rows(0).getSeq[Double](1)
    assert(!signBit(xs0.head) && xs0(1) == 1.5 && xs0(2) == -2.0)
    assert(!signBit(rows(1).getSeq[Double](1)(1)))
    assert(rows(0).getDouble(2).isNaN)
    assert(rows(1).isNullAt(2))
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

  test("every registry entry names a real catalog query, and its " +
    "oracle is wrapped with the star-REPLACE over exactly those " +
    "columns") {
    assert(SignedZero.registry.nonEmpty, "registry resource missing")
    val qs = Catalog.queries.keySet
    val missing = SignedZero.registry.keySet.diff(qs)
    assert(missing.isEmpty, s"stale registry entries: $missing")
    SignedZero.registry.foreach { case (name, cols) =>
      Catalog.oracleSql.get(name).foreach { sql =>
        assert(sql.startsWith("SELECT * REPLACE ("), name)
        cols.foreach {
          case c if c.endsWith("[]") =>
            val b = c.dropRight(2)
            assert(sql.contains(s"list_transform($b, x -> x + 0.0) AS $b"),
              s"$name missing array canon for $b")
          case c =>
            assert(sql.contains(s"$c + 0.0 AS $c"),
              s"$name missing canon for $c")
        }
      }
    }
  }

  test("finalOrderBy extracts the top-level ORDER BY only — skipping " +
    "OVER (ORDER BY), subquery sorts, string literals — strips LIMIT " +
    "and table qualifiers, and returns None when absent") {
    import SignedZero.{finalOrderBy => f}
    assert(f("SELECT a FROM t ORDER BY a") == Some("a"))
    assert(f("SELECT a FROM t ORDER BY a DESC NULLS LAST, b LIMIT 5")
      == Some("a DESC NULLS LAST, b"))
    assert(f("SELECT nd.a FROM nd ORDER BY nd.a, x.b2") == Some("a, b2"))
    assert(f("SELECT round(a, 1.5) FROM t ORDER BY abs(a - 1.5) DESC")
      == Some("abs(a - 1.5) DESC"))
    // window ORDER BY is inside parens — not a final sort
    assert(f("SELECT rank() OVER (ORDER BY a) FROM t").isEmpty)
    // subquery sort is inside parens
    assert(f("SELECT * FROM (SELECT a FROM t ORDER BY a) q").isEmpty)
    // a string literal containing the words must not fool the scanner
    assert(f("SELECT 'ORDER BY x' AS s FROM t").isEmpty)
    assert(f("SELECT count(*) FROM t").isEmpty)
    // final sort after a windowed CTE: picks the OUTER one
    assert(f("WITH w AS (SELECT a, sum(b) OVER (ORDER BY a) s FROM t " +
      "ORDER BY s) SELECT * FROM w ORDER BY a, s") == Some("a, s"))
  }

  test("canonSql re-applies the final ORDER BY on the wrapper so row " +
    "order is guaranteed, not a DuckDB insertion-order artifact") {
    // pick a registry query whose oracle has a top-level ORDER BY
    val name = "q1_pricing_agg"
    val sql = Catalog.oracleSql(name)
    assert(sql.startsWith("SELECT * REPLACE ("), sql.take(80))
    val tail = sql.substring(sql.lastIndexOf(')'))
    assert(tail.contains("ORDER BY"),
      s"wrapper lost the final sort: ...$tail")
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
