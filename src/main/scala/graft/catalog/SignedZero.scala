package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, transform}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField}

/** Signed-zero canonicalization for the oracle compare.
  *
  * The one hash-divergence class the value-rounding discipline cannot
  * close: Spark's `round` (BigDecimal HALF_UP) canonicalizes −0.0 to
  * +0.0 while DuckDB's `round` preserves the sign bit, so any SIGNED
  * rounded score whose magnitude rounds to zero (a tiny-negative
  * statistic — the q396 round-8 episode: G² ≈ −3e−6 at sf0.01) hashes
  * differently across engines even though every printed value agrees.
  *
  * Closure, applied centrally at catalog assembly. Rounds 8–9 used an
  * enumerated query→signed-columns map built from per-column minima at
  * sf0.001/sf0.01 — which a column that first goes negative at a
  * DIFFERENT scale factor would slip. Round 10 makes it structural:
  *  - Spark side ([[canonDf]]): `col + 0.0` for EVERY top-level
  *    DoubleType output column and every element of an
  *    ArrayType(DoubleType) column, derived from the query's own
  *    schema — no enumeration, nothing to go stale. IEEE 754:
  *    −0.0 + 0.0 = +0.0; every other value, including NaN and ±∞, is
  *    unchanged, so this is a no-op projection except on −0.0.
  *  - Oracle side ([[canonSql]]): `SELECT * REPLACE (c + 0.0 AS c, …)
  *    FROM (sql)` over the same columns. SQL is a string, so the
  *    double-column set comes from a checked-in registry resource
  *    (`graft/signed_zero_cols.tsv`) generated from the live query
  *    schemas by [[graft.tools.CatalogInventory]]; schemas are
  *    scale-factor-independent, and `CatalogPlanAuditSpec` fails the
  *    suite if the registry drifts from any query's actual schema —
  *    so Spark-side (generic) and oracle-side (registry) can never
  *    disagree on a committed build.
  *
  * The REPLACE wrapper is a plain projection; DuckDB preserves the
  * inner ORDER BY under its default `preserve_insertion_order`, but
  * that is engine behavior, not a SQL guarantee — so [[canonSql]] also
  * RE-APPLIES the query's final top-level ORDER BY (extracted by a
  * paren/string-aware scan, table qualifiers stripped since the outer
  * scope sees only output columns) on the wrapper, making row order a
  * stated property again. Queries with no top-level ORDER BY (single-
  * row aggregates) are wrapped without one.
  *
  * `tools/selfcheck.py` distinguishes −0.0 from +0.0 (`--selftest`
  * pins that), so a regression in this closure fails the local gate
  * the same way it would fail the driver's hash.
  */
object SignedZero {

  /** Registry rows: query name → (double output columns — top-level
    * DoubleType as plain names, ArrayType(DoubleType) suffixed `[]` —
    * and the FULL output column list, which gates the ORDER BY
    * re-application), generated from live schemas by
    * [[graft.tools.CatalogInventory]]. Loaded from the classpath so
    * [[Catalog.oracleSql]] stays a pure map (no SparkSession at
    * assembly). */
  lazy val registryFull: Map[String, (Seq[String], Seq[String])] = {
    val in = getClass.getResourceAsStream("/graft/signed_zero_cols.tsv")
    if (in == null) Map.empty
    else try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val parts = l.split("\t", 3)
          val doubles = parts(1).split(",").toSeq.filter(_.nonEmpty)
          val all =
            if (parts.length > 2) parts(2).split(",").toSeq.filter(_.nonEmpty)
            else Seq.empty
          parts(0) -> (doubles, all)
        }.toMap
    } finally in.close()
  }

  /** query → double output columns (the REPLACE list). */
  lazy val registry: Map[String, Seq[String]] =
    registryFull.map { case (k, (d, _)) => k -> d }
      .filter(_._2.nonEmpty)

  /** The registry's view of a DataFrame schema: every top-level double
    * column, plus array-of-double columns marked with a `[]` suffix.
    * Nested structs/maps are out of scope (no catalog query emits
    * doubles inside them; CatalogInventory warns if one appears). */
  def doubleCols(fields: Seq[StructField]): Seq[String] =
    fields.collect {
      case StructField(n, DoubleType, _, _) => n
      case StructField(n, ArrayType(DoubleType, _), _, _) => s"$n[]"
    }

  /** Spark side: +0.0 every double output column, schema-derived. The
    * cast pins the original type so the projection can never shift the
    * schema; array elements keep containsNull via the cast back. */
  def canonDf(df: DataFrame): DataFrame = {
    val canons: Seq[(String, org.apache.spark.sql.Column)] =
      df.schema.fields.toSeq.collect {
        case StructField(n, DoubleType, _, _) =>
          n -> (col(n) + lit(0.0)).cast(DoubleType)
        case StructField(n, at @ ArrayType(DoubleType, _), _, _) =>
          n -> transform(col(n), x => x + lit(0.0)).cast(at: DataType)
      }
    if (canons.isEmpty) df else df.withColumns(canons.toMap)
  }

  /** Oracle side: star-REPLACE the registry columns over the query and
    * re-apply its final ORDER BY (see object doc). */
  def canonSql(name: String, sql: String): String =
    registry.getOrElse(name, Nil) match {
      case Nil => sql
      case cols =>
        val repl = cols.map {
          case c if c.endsWith("[]") =>
            val b = c.dropRight(2)
            s"list_transform($b, x -> x + 0.0) AS $b"
          case c => s"$c + 0.0 AS $c"
        }.mkString(", ")
        val out = registryFull.get(name).map(_._2).getOrElse(Seq.empty)
        val tail = finalOrderBy(sql)
          .filter(ob => reapplicable(ob, out))
          .map(ob => s"\nORDER BY $ob").getOrElse("")
        s"SELECT * REPLACE ($repl) FROM (\n$sql\n)$tail"
    }

  /** The outer scope resolves OUTPUT columns only, so the extracted
    * ORDER BY is re-applied iff every item is a plain (already
    * unqualified) column reference to a known output column — or an
    * ordinal — with optional ASC/DESC/NULLS FIRST|LAST. Expression
    * sorts or sorts on non-projected inner columns (q10's
    * `ORDER BY o_totalprice` under `SELECT ... AS total`) fall back
    * to the inner sort + DuckDB's default insertion-order
    * preservation, the round-9-proven behavior. */
  private def reapplicable(ob: String, outputCols: Seq[String]): Boolean = {
    val known = outputCols.toSet
    outputCols.nonEmpty && ob.split(",").map(_.trim).forall { item =>
      val m = java.util.regex.Pattern.compile(
        "(?i)^([A-Za-z_][A-Za-z_0-9]*|\\d+)" +
          "(\\s+(ASC|DESC))?(\\s+NULLS\\s+(FIRST|LAST))?$")
        .matcher(item)
      m.matches() && {
        val ref = m.group(1)
        ref.forall(_.isDigit) || known.contains(ref)
      }
    }
  }

  /** Extract the final TOP-LEVEL `ORDER BY` clause of `sql` — the last
    * occurrence at paren depth 0 outside string literals — minus any
    * trailing `LIMIT n [OFFSET m]`, with table qualifiers stripped
    * (`nd.gene` → `gene`; the outer scope resolves output columns
    * only; numeric literals like `1.5` are untouched because a
    * qualifier must start with a letter/underscore). None when the
    * query has no top-level ORDER BY. */
  private[catalog] def finalOrderBy(sql: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("(?i)\\bORDER\\s+BY\\b").matcher(sql)
    var best = -1 // end offset of the last depth-0 ORDER BY token
    while (m.find()) {
      // depth/string state at the match start
      var depth = 0; var inStr = false; var i = 0
      while (i < m.start()) {
        val ch = sql.charAt(i)
        if (inStr) { if (ch == '\'') inStr = false }
        else ch match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      if (depth == 0 && !inStr) best = m.end()
    }
    if (best < 0) None
    else {
      val raw = sql.substring(best).trim.stripSuffix(";").trim
      val noLimit = raw.replaceAll(
        "(?is)\\s+LIMIT\\s+\\d+(\\s+OFFSET\\s+\\d+)?\\s*$", "")
      val unqualified = noLimit.replaceAll(
        "\\b([A-Za-z_][A-Za-z_0-9]*)\\.([A-Za-z_][A-Za-z_0-9]*)\\b",
        "$2")
      Some(unqualified).filter(_.nonEmpty)
    }
  }
}
