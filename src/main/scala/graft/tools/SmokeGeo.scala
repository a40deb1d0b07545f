package graft.tools

import org.apache.spark.sql.SparkSession

import graft.de.DifferentialExpression
import graft.geo.GeoMatrixReader
import graft.mapping.ProbeMapping
import graft.prep.Preprocess

/** Drives the GEO slice end-to-end through the public API:
  * parse -> preprocess -> probe collapse -> differential expression.
  * Usage: sbt "runMain graft.tools.SmokeGeo <matrix.txt[.gz]> <mapping.csv>"
  * (defaults to the test fixtures).
  */
object SmokeGeo {
  def main(args: Array[String]): Unit = {
    val matrix = args.headOption.getOrElse(
      "src/test/resources/tiny_geo_matrix.txt")
    val mappingCsv = args.lift(1).getOrElse(
      "src/test/resources/tiny_probe_mapping.csv")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val geo = GeoMatrixReader.read(spark, matrix)
    println(s"SAMPLES=${geo.sampleIds.mkString(",")}")
    geo.metadata.show(truncate = false)
    val prepped = Preprocess.run(geo.expression, geo.sampleIds.length)
    val mapping = ProbeMapping.loadMappingCsv(spark, mappingCsv)
    val genes = ProbeMapping.collapseToGenes(prepped, mapping)
    val results = DifferentialExpression.run(spark, genes, geo.sampleIds, geo.metadata)
    println("DIFFERENTIAL_RESULTS:")
    results.orderBy("gene").show(truncate = false)
    val sig = DifferentialExpression.significant(results)
    println(s"SIGNIFICANT=${sig.count()}")
    spark.stop()
  }
}
