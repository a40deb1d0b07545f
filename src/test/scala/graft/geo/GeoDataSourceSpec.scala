package graft.geo

import graft.SparkSuite

class GeoDataSourceSpec extends SparkSuite {

  test("format(\"geo\") yields the same long expression table as GeoMatrixReader") {
    val path = resource("tiny_geo_matrix.txt")
    val viaDsv2 = spark.read.format("geo").load(path)
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val viaReader = GeoMatrixReader.read(spark, path).expression
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(viaDsv2 == viaReader)
    assert(viaDsv2.nonEmpty)
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
    assert(GeoLineParser.parseDataRow("p1\t1.0\t2.0", 2).exists(_._1 == "p1"))
    assert(GeoLineParser.parseDataRow("p1\t1.0\tjunk", 2).isEmpty)
    assert(GeoLineParser.parseDataRow("p1\t1.0", 2).isEmpty)      // short row
    assert(GeoLineParser.parseDataRow("!meta\t1\t2", 2).isEmpty)
  }
}
