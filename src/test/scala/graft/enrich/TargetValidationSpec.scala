package graft.enrich

import graft.SparkSuite

class TargetValidationSpec extends SparkSuite {

  private def openTargets() = {
    import spark.implicits._
    // Seeded from the committed reference run (FIXTURES.md §3):
    // CACNA1F 324 drugs / avg 0.577, IL12A 0 drugs / 0.251, and an
    // empty-rows gene exercising the avg->0 branch.
    val json = Seq(
      """{"ensembl_id":"ENSG1","approvedSymbol":"CACNA1F","biotype":"protein_coding",
         "knownDrugs":{"count":324,"rows":[{"drug":{"id":"D1","name":"drugA"}}]},
         "associatedDiseases":{"count":2,"rows":[
           {"disease":{"id":"X1","name":"d1"},"score":0.6},
           {"disease":{"id":"X2","name":"d2"},"score":0.554}]}}""",
      """{"ensembl_id":"ENSG2","approvedSymbol":"IL12A","biotype":"protein_coding",
         "knownDrugs":{"count":0,"rows":[]},
         "associatedDiseases":{"count":1,"rows":[
           {"disease":{"id":"X3","name":"d3"},"score":0.251}]}}""",
      """{"ensembl_id":"ENSG3","approvedSymbol":"EMPTY1","biotype":"protein_coding",
         "knownDrugs":{"count":5,"rows":[]},
         "associatedDiseases":{"count":0,"rows":[]}}"""
    ).map(_.replaceAll("\n\\s*", "")).toDS()
    spark.read.schema(TargetValidation.openTargetsSchema).json(json)
  }

  test("validate: joins, A13 avg score, A16 drugability, miss zero-fill, sort") {
    import spark.implicits._
    val scores = Seq(
      ("CACNA1F", 0.9), ("IL12A", 0.8), ("EMPTY1", 0.7),
      ("NOHIT", 0.6),                    // no ensembl row -> zero-filled
      ("1234_at", 0.95),                 // invalid symbol (F6) -> filtered
      ("UNKNOWN_X", 0.94))               // invalid prefix -> filtered
      .toDF("gene", "composite_score")
    val ensembl = Seq(("CACNA1F", "ENSG1"), ("IL12A", "ENSG2"),
      ("EMPTY1", "ENSG3")).toDF("symbol", "ensembl_id")

    val out = TargetValidation.validate(scores, ensembl, openTargets())
    assert(out.columns.toSeq == Seq("gene", "composite_score",
      "num_known_drugs", "avg_association_score", "drugability_score"))
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

    assert(rows("CACNA1F") == ((324L, 0.577, 194.631)))   // 0.6*324+0.4*0.577
    assert(rows("IL12A") == ((0L, 0.251, 0.1)))           // 0.4*0.251 rounded
    assert(rows("EMPTY1") == ((5L, 0.0, 3.0)))            // empty rows -> avg 0
    assert(rows("NOHIT") == ((0L, 0.0, 0.0)))             // left-join miss
    assert(!rows.contains("1234_at") && !rows.contains("UNKNOWN_X"))

    // sorted by drugability desc
    val order = out.collect().map(_.getString(0)).toSeq
    assert(order == Seq("CACNA1F", "EMPTY1", "IL12A", "NOHIT"))
  }

  test("onlineEnrich: same schema and miss semantics as the snapshot join") {
    import spark.implicits._
    // mock service: bodies for ENSG1/ENSG2 only — ENSG3 is a MISS on the
    // online path while the snapshot path has it; both paths must
    // zero-fill identically for ids neither side resolves (NOHIT).
    val bodies = Map(
      "ENSG1" ->
        """{"ensembl_id":"ENSG1","approvedSymbol":"CACNA1F","biotype":"protein_coding",
           "knownDrugs":{"count":324,"rows":[{"drug":{"id":"D1","name":"drugA"}}]},
           "associatedDiseases":{"count":2,"rows":[
             {"disease":{"id":"X1","name":"d1"},"score":0.6},
             {"disease":{"id":"X2","name":"d2"},"score":0.554}]}}""",
      "ENSG2" ->
        """{"ensembl_id":"ENSG2","approvedSymbol":"IL12A","biotype":"protein_coding",
           "knownDrugs":{"count":0,"rows":[]},
           "associatedDiseases":{"count":1,"rows":[
             {"disease":{"id":"X3","name":"d3"},"score":0.251}]}}"""
    ).map { case (k, v) => k -> v.replaceAll("\n\\s*", "") }
    val ids = Seq("ENSG1", "ENSG2", "ENSG3").toDF("ensembl_id")
    val fetch: Seq[String] => Map[String, String] =
      batch => bodies.filter { case (k, _) => batch.contains(k) }
    val online = TargetValidation.onlineEnrich(ids, "ensembl_id", fetch,
      batchSize = 2, minIntervalMillis = 1)

    // exact snapshot schema
    val snapshotCols = Seq("ensembl_id", "approvedSymbol", "biotype",
      "knownDrugs", "associatedDiseases")
    assert(online.columns.toSeq == snapshotCols)
    assert(online.schema.map(_.dataType) ==
      openTargets().select(snapshotCols.map(org.apache.spark.sql
        .functions.col): _*).schema.map(_.dataType))

    // validate() runs unchanged: hits score identically to the snapshot
    // path; the online-missing ENSG3 (EMPTY1) zero-fills like NOHIT
    val scores = Seq(("CACNA1F", 0.9), ("IL12A", 0.8), ("EMPTY1", 0.7),
      ("NOHIT", 0.6)).toDF("gene", "composite_score")
    val ensembl = Seq(("CACNA1F", "ENSG1"), ("IL12A", "ENSG2"),
      ("EMPTY1", "ENSG3")).toDF("symbol", "ensembl_id")
    val out = TargetValidation.validate(scores, ensembl, online)
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows("CACNA1F") == ((324L, 0.577, 194.631)))
    assert(rows("IL12A") == ((0L, 0.251, 0.1)))
    assert(rows("EMPTY1") == ((0L, 0.0, 0.0)))   // online miss -> zero-fill
    assert(rows("NOHIT") == ((0L, 0.0, 0.0)))    // unresolved id -> zero-fill
  }

  test("is_valid_symbol matches the reference predicate on edge cases") {
    import spark.implicits._
    import graft.functions.gfunctions.is_valid_symbol
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "DDR1" -> true, "A" -> true, "gene-1.2" -> true,
      "1234_at" -> false,           // probe id
      "UNKNOWN_X" -> false,         // unknown prefix
      "123" -> false,               // no letter
      "TOOLONGSYMBOLNAMEXXXX" -> false, // 21 chars
      "BAD SYMBOL" -> false,        // space
      "with_underscore" -> false    // '_at' not present but '_' invalid char
    )
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), is_valid_symbol(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (s, expected) =>
      assert(got(s) == expected, s"symbol $s")
    }
  }
}
