package graft.de

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.geo.GeoMatrixReader
import graft.mapping.ProbeMapping
import graft.prep.Preprocess

class DifferentialExpressionSpec extends SparkSuite {

  test("e2e: fixture -> preprocess -> mapping -> DE has reference schema + invariants") {
    val geo = GeoMatrixReader.read(spark, resource("tiny_geo_matrix.txt"))
    val prepped = Preprocess.run(geo.expression, geo.sampleIds.length)
    val mapping = ProbeMapping.loadMappingCsv(spark, resource("tiny_probe_mapping.csv"))
    val genes = ProbeMapping.collapseToGenes(prepped, mapping)
    val res = DifferentialExpression.run(spark, genes, geo.sampleIds, geo.metadata)

    assert(res.columns.toSeq == Seq("gene", "log2FC", "pvalue", "adjusted_pvalue"))
    val rows = res.collect()
    // 3 surviving probes (117_at row dropped at parse) all map -> 3 genes
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("DDR1", "PAX8", "RFC2"))
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        val p = r.getDouble(2)
        assert(p >= 0.0 && p <= 1.0)
      }
      if (!r.isNullAt(3)) {
        val adj = r.getDouble(3)
        assert(adj >= 0.0 && adj <= 1.0)
        if (!r.isNullAt(2)) assert(adj >= r.getDouble(2) - 1e-12)
      }
    }
    // DDR1 (8.1, 8.3 vs 5.1, 5.0) is strongly case-up: log2FC > 1
    val ddr1 = rows.find(_.getString(0) == "DDR1").get
    assert(ddr1.getDouble(1) > 1.0)
  }

  test("resolveGroups: id match, then half/half fallback") {
    import spark.implicits._
    val meta = Seq(("GSM1", "case"), ("GSM2", "case"),
      ("GSM3", "control"), ("GSM4", "control")).toDF("sample_id", "condition")
    val ok = DifferentialExpression.resolveGroups(
      Seq("GSM1", "GSM2", "GSM3", "GSM4"), meta)
    assert(ok.toMap == Map("GSM1" -> "case", "GSM2" -> "case",
      "GSM3" -> "control", "GSM4" -> "control"))

    // quoted expression ids still match (J2 normalization)
    val quoted = DifferentialExpression.resolveGroups(
      Seq("\"GSM1\"", "\"GSM2\"", "\"GSM3\"", "\"GSM4\""), meta)
    assert(quoted.map(_._2) == Seq("case", "case", "control", "control"))

    // only 1 control matched -> arbitrary halves over ALL samples in order
    val meta2 = Seq(("GSM1", "case"), ("GSM2", "case"), ("GSM3", "control"))
      .toDF("sample_id", "condition")
    val fb = DifferentialExpression.resolveGroups(
      Seq("GSM1", "GSM2", "GSM3", "GSM4"), meta2)
    assert(fb == Seq("GSM1" -> "control", "GSM2" -> "control",
      "GSM3" -> "case", "GSM4" -> "case"))
  }
}
