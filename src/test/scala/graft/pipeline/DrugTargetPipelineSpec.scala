package graft.pipeline

import java.nio.file.Files

import graft.SparkSuite

class DrugTargetPipelineSpec extends SparkSuite {

  test("full 9-stage run on the tiny fixture: all sinks written, no failures") {
    val out = Files.createTempDirectory("graft-pipe").toString
    val cfg = PipelineConfig(
      matrixPath = resource("tiny_geo_matrix.txt"),
      mappingCsvPath = resource("tiny_probe_mapping.csv"),
      outputDir = out,
      ensemblSnapshotPath = Some(resource("tiny_ensembl_snapshot.csv")),
      openTargetsSnapshotPath = Some(resource("tiny_opentargets_snapshot.json")))
    val result = new DrugTargetPipeline(spark, cfg).run()

    assert(result.failures.isEmpty,
      s"stage failures: ${result.failures.map { case (n, e) => s"$n: $e" }}")
    for (d <- Seq("metadata", "gene_mapped", "differential_results",
        "volcano_data", "significant_genes", "correlation_matrix",
        "network_targets", "final_targets", "network_viz_nodes",
        "network_viz_edges", "top_targets_barplot")) {
      assert(new java.io.File(s"$out/data/$d").exists(), s"missing sink $d")
    }
    assert(new java.io.File(s"$out/data/gene_network.gexf").exists())
    val summary = Files.readString(java.nio.file.Paths.get(s"$out/summary.txt"))
    assert(summary.contains("Samples: 4 (2 case / 2 control)"))
    assert(summary.contains("Significant genes: 1"))

    // final targets: DDR1 significant -> in network -> validated with
    // snapshot values 12 drugs, avg (0.7+0.3)/2 = 0.5 -> drugability 7.4
    val ft = result.finalTargets.get.collect()
      .map(r => r.getString(0) -> r.getAs[Double]("drugability_score")).toMap
    assert(ft.contains("DDR1") && approx(ft("DDR1"), 7.4))
  }

  test("degenerate: no significant genes -> variance fallback, pipeline completes") {
    val out = Files.createTempDirectory("graft-pipe2").toString
    // all-flat expression: no significance, correlations null -> empty net
    val tmp = Files.createTempDirectory("graft-fix")
    val matrix = tmp.resolve("flat.txt")
    val rows = (1 to 4).map(i => s""""p${i}_x"\t1.0\t2.0\t1.0\t2.0""")
    Files.writeString(matrix,
      "!Sample_geo_accession\t\"S1\"\t\"S2\"\t\"S3\"\t\"S4\"\n" +
        "\"ID_REF\"\t\"S1\"\t\"S2\"\t\"S3\"\t\"S4\"\n" + rows.mkString("\n") + "\n")
    val mapping = tmp.resolve("map.csv")
    Files.writeString(mapping,
      "PROBEID,SYMBOL\n" + (1 to 4).map(i => s"p${i}_x,G$i").mkString("\n") + "\n")
    val cfg = PipelineConfig(matrix.toString, mapping.toString, out.toString)
    val result = new DrugTargetPipeline(spark, cfg).run()
    assert(result.failures.isEmpty,
      s"stage failures: ${result.failures.map { case (n, e) => s"$n: $e" }}")
    assert(result.targetScores.isDefined)
  }
}
