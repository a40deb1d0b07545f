package graft.geo

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSuite

class GeoDataSourceSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

  test("format(\"geo\") equals the column-expression parse path") {
    val path = resource("tiny_geo_matrix.txt")
    val viaDsv2 = rows(spark.read.format("geo").load(path))
    // the DataFrame-expression twin (GeoMatrixReader.parseExpression) is
    // the independent implementation of the same GeoLineParser semantics
    val sampleIds = GeoMatrixReader.read(spark, path).sampleIds
    val viaExpr = rows(GeoMatrixReader.parseExpression(
      spark.read.text(path), sampleIds))
    assert(viaDsv2 == viaExpr)
    assert(viaDsv2.nonEmpty)
  }

  test("split uncompressed read (many tiny byte ranges) equals unsplit read") {
    val path = resource("tiny_geo_matrix.txt")
    val unsplit = rows(spark.read.format("geo").load(path))
    // 64-byte ranges force many splits across header and data lines;
    // line ownership must neither drop nor duplicate any row
    val split = spark.read.format("geo").option("maxSplitBytes", "64").load(path)
    assert(split.rdd.getNumPartitions > 1)
    assert(rows(split) == unsplit)
    // a mid-file split size exercises the straddling-line handoff too
    assert(rows(spark.read.format("geo").option("maxSplitBytes", "700")
      .load(path)) == unsplit)
  }

  test("gzip file reads whole (single partition) and equals uncompressed") {
    val src = Paths.get(resource("tiny_geo_matrix.txt"))
    val dir = Files.createTempDirectory("geo-gz")
    val gz = dir.resolve("matrix.txt.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(Files.readAllBytes(src)); out.close()
    val viaGz = spark.read.format("geo").load(gz.toString)
    assert(viaGz.rdd.getNumPartitions == 1, "gzip is unsplittable")
    assert(rows(viaGz) == rows(spark.read.format("geo").load(src.toString)))
    // mixed directory: gzip + uncompressed copies of the same matrix
    Files.copy(src, dir.resolve("matrix2.txt"))
    val both = spark.read.format("geo").load(dir.toString)
    assert(both.count() == 2 * viaGz.count())
  }

  test("directory load skips _metadata and dotfiles by file name") {
    val dir = Files.createTempDirectory("geo-dir")
    Files.copy(Paths.get(resource("tiny_geo_matrix.txt")),
      dir.resolve("matrix.txt"), StandardCopyOption.REPLACE_EXISTING)
    // decoys that would inject rows if scanned: a _SUCCESS marker and a
    // hidden file, both with an ID_REF header and one data line
    val decoy = "ID_REF\tGSMX\nBAD_PROBE\t1.0\n"
    Files.writeString(dir.resolve("_SUCCESS"), decoy)
    Files.writeString(dir.resolve(".hidden"), decoy)
    val got = rows(spark.read.format("geo").load(dir.toString))
    val expected = rows(spark.read.format("geo")
      .load(dir.resolve("matrix.txt").toString))
    assert(got == expected)
    assert(!got.exists(_._1 == "BAD_PROBE"))
  }

  test("trailing-tab header: both read paths agree (Python split semantics)") {
    val dir = Files.createTempDirectory("geo-ttab")
    val f = dir.resolve("m.txt")
    java.nio.file.Files.writeString(f,
      "!Series_title\t\"x\"\nID_REF\tS1\tS2\t\np1\t1.0\t2.0\t\n")
    // Python str.split('\t') keeps the trailing empty field -> 3 sample
    // columns (S1, S2, ''); every data row's empty last token fails
    // float() and the row drops — on BOTH paths identically (a bare Java
    // split would see 2 samples on one path and keep the rows)
    val viaReader = GeoMatrixReader.read(spark, f.toString)
    assert(viaReader.sampleIds == Seq("S1", "S2", ""))
    assert(viaReader.expression.collect().isEmpty)
    assert(spark.read.format("geo").load(f.toString).collect().isEmpty)
  }

  test("line parser: probe cleanup, row drop, nan/inf -> null") {
    assert(GeoLineParser.cleanProbeId("\"1007_s_at\"") == "1007_s_at")
    assert(GeoLineParser.cleanProbeId("1234:AFFX-x") == "AFFX-x")
    assert(GeoLineParser.cleanProbeId("12-34") == "34")
    assert(GeoLineParser.parseValue("3.25").contains(3.25))
    assert(GeoLineParser.parseValue(" 1e3 ").contains(1000.0))
    assert(GeoLineParser.parseValue("NaN").contains(null: java.lang.Double))
    assert(GeoLineParser.parseValue("-inf").contains(null: java.lang.Double))
    assert(GeoLineParser.parseValue("abc").isEmpty)
    assert(GeoLineParser.parseValue("1.5d").isEmpty)   // Python float() rejects
    assert(GeoLineParser.parseValue("0x1.8p3").isEmpty)  // Java hex float; Python rejects
    assert(GeoLineParser.parseValue("-0X10").isEmpty)
    assert(GeoLineParser.parseValue("0").contains(0.0)) // plain zero still parses
    assert(GeoLineParser.parseDataRow("p1\t1.0\t2.0", 2).exists(_._1 == "p1"))
    assert(GeoLineParser.parseDataRow("p1\t1.0\tjunk", 2).isEmpty)
    assert(GeoLineParser.parseDataRow("p1\t1.0", 2).isEmpty)      // short row
    assert(GeoLineParser.parseDataRow("!meta\t1\t2", 2).isEmpty)
  }
}
