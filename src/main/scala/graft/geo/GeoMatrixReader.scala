package graft.geo

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.gfunctions.nan_inf_to_null

/** Parsed GEO series: long-form expression + row-per-sample metadata.
  *
  * `expression`: (probe_id STRING, sample_id STRING, value DOUBLE) — long
  * form is the scale-friendly shape (SURVEY §1.1): per-probe operations are
  * `groupBy`/window over probe_id, per-sample over sample_id, and the row
  * count grows with probes × samples instead of a wide schema growing with
  * samples.
  *
  * `metadata`: (sample_id STRING, ordinal INT, title STRING,
  * condition STRING, characteristics MAP<STRING,STRING>) — ordinal is the
  * sample's column position in the source file (drives the reference's
  * positional fallbacks, `pipeline2.py:392-401,567-573`).
  */
final case class GeoData(expression: DataFrame, metadata: DataFrame,
                         sampleIds: Seq[String])

/** GEO Series Matrix reader (S1–S3, `pipeline2.py:170-347,434-474`).
  *
  * Line routing is content-based rather than stateful: `!` lines are
  * metadata, `#` lines are skipped, the line containing `ID_REF` is the
  * sample header, everything else with enough tab-separated fields is a data
  * row — same net routing as the reference's `in_data_section` flag on
  * well-formed files, but order-independent so the scan parallelizes.
  *
  * Metadata lines are parsed on the driver: their count is bounded by
  * #samples × #characteristic-keys (dimension-sized by construction), while
  * the expression rows — the part that scales — stay distributed.
  * Gzip input is transparent (`spark.read.text` handles .gz).
  */
object GeoMatrixReader {

  private val CancerKeywords =
    Seq("cancer", "tumor", "tumour", "malignant", "carcinoma")
  private val BenignKeywords =
    Seq("benign", "normal", "healthy", "non-tumor", "non-cancer", "non-malignant")

  /** Python str.strip(chars) semantics: remove any run of `chars` from both
    * ends (`pipeline2.py:228,240,254` use `.strip('"')` / `.strip('"\'')`). */
  private def pyStrip(s: String, chars: String): String = {
    var start = 0
    var end = s.length
    while (start < end && chars.indexOf(s.charAt(start)) >= 0) start += 1
    while (end > start && chars.indexOf(s.charAt(end - 1)) >= 0) end -= 1
    s.substring(start, end)
  }

  def read(spark: SparkSession, path: String): GeoData = {
    // Two driver-side collects (header line, '!' metadata block) plus a
    // distributed expression scan through the DSv2 `geo` format, which
    // splits uncompressed files by byte range. No raw-text cache: at
    // 100 TB caching the matrix text would store the dataset twice.
    // The header collect short-circuits via limit(1); the metadata
    // collect is one narrow full scan whose OUTPUT is dimension-sized
    // (text sources don't push value predicates) — the price of not
    // holding a second copy of the matrix.
    val lines = spark.read.text(path)
    val v = col("value")

    // Sample header (single line): ids keep their source order.
    val headerLine = lines
      .filter(!v.startsWith("!") && !v.startsWith("#") && v.contains("ID_REF"))
      .limit(1).collect().headOption
      .map(_.getString(0))
      .getOrElse(throw new IllegalArgumentException(
        s"No ID_REF header line found in $path"))
    // The reference keeps raw (possibly quoted) sample ids in the expression
    // frame and strips quotes later during reconciliation
    // (`pipeline2.py:363-370`); graft folds the normalization into the parse.
    // GeoLineParser.parseHeader is the single header-split implementation
    // (split with -1 keeps trailing empty fields, like Python str.split) —
    // a bare split("\t") here would disagree with the DSv2 reader on
    // trailing-tab headers and silently drop every data row.
    val sampleIds: Seq[String] = GeoLineParser.parseHeader(headerLine)

    val metaLines = lines.filter(v.startsWith("!"))
      .collect().map(_.getString(0)).toSeq
    val metadata = buildMetadata(spark, metaLines)

    GeoData(spark.read.format("geo").load(path), metadata, sampleIds)
  }

  /** S3: data rows -> long form. Probe-id cleanup reproduces
    * `pipeline2.py:449-459`: take the substring after the FIRST ':' if
    * present, else after the FIRST '-' if present, then strip quotes and
    * whitespace. A row is dropped when any of its n values would fail
    * Python float() (`pipeline2.py:464-468`); values that parse to NaN/Inf
    * are kept as rows but normalized to null (SURVEY §1.2). */
  private[geo] def parseExpression(lines: DataFrame,
                                   sampleIds: Seq[String]): DataFrame = {
    val n = sampleIds.length
    val v = col("value")
    val parts = split(v, "\t")

    val probeRaw = element_at(col("__parts"), 1)
    val afterPrefix = when(probeRaw.contains(":"), regexp_replace(probeRaw, "^[^:]*:", ""))
      .when(probeRaw.contains("-"), regexp_replace(probeRaw, "^[^-]*-", ""))
      .otherwise(probeRaw)
    val probeId = trim(regexp_replace(afterPrefix, "^[\"']+|[\"']+$", ""))

    val tokens = slice(col("__parts"), 2, n)
    // Python float() accepts numbers and any-case nan/inf spellings. Spark's
    // string->double try_cast goes through Java parseDouble, which ALSO
    // accepts 'd'/'f' type suffixes and hex floats that Python (and
    // GeoLineParser.parseValue, the DSv2 twin) reject — the two extra
    // guards keep the paths identical.
    val tokenOk = (x: org.apache.spark.sql.Column) =>
      (x.try_cast(DoubleType).isNotNull &&
        !trim(x).rlike("[dDfF]$") && !trim(x).rlike("^[+-]?0[xX]")) ||
        lower(trim(x)).rlike("^[+-]?(nan|inf|infinity)$")

    lines
      .filter(!v.startsWith("!") && !v.startsWith("#") && !v.contains("ID_REF"))
      .withColumn("__parts", parts)
      .filter(size(col("__parts")) >= n + 1)                    // guard, py:441
      .filter(forall(tokens, tokenOk))                          // row drop, py:464-468
      .select(probeId.as("probe_id"),
        posexplode(transform(tokens, x => nan_inf_to_null(x.try_cast(DoubleType)))))
      .select(col("probe_id"),
        element_at(typedLit(sampleIds), col("pos") + 1).as("sample_id"),
        col("col").as("value"))
  }

  /** S2 + the grouping rules (`pipeline2.py:213-347`): accession + title
    * lines, characteristics pivot (label taken from the FIRST sample's
    * "label: value" — a reference quirk kept as-is), cancer/benign keyword
    * assignment with tissue -> title -> any-characteristic precedence, and
    * the half/half default when either group has < 2 samples. */
  private[geo] def buildMetadata(spark: SparkSession,
                                 metaLines: Seq[String]): DataFrame = {
    // split limit -1: keep trailing empty fields (Python str.split
    // semantics — the last sample's empty characteristic must survive)
    def firstLine(prefix: String): Option[Array[String]] =
      metaLines.find(_.startsWith(prefix)).map(_.split("\t", -1))

    val sampleIds: Seq[String] = firstLine("!Sample_geo_accession")
      .map(_.drop(1).toSeq.map(pyStrip(_, "\""))).getOrElse(Seq.empty)
    val titles: Seq[String] = firstLine("!Sample_title")
      .map(_.drop(1).toSeq.map(pyStrip(_, "\""))).getOrElse(Seq.empty)

    val characteristics: Map[String, scala.collection.mutable.LinkedHashMap[String, String]] =
      sampleIds.map(_ -> scala.collection.mutable.LinkedHashMap.empty[String, String]).toMap

    metaLines.filter(_.startsWith("!Sample_characteristics_ch")).foreach { line =>
      val parts = line.split("\t", -1)
      if (parts.length >= 2) {
        val first = pyStrip(parts(1), "\"").trim
        if (first.contains(":")) {
          val label = first.split(":", 2)(0).trim.toLowerCase
          sampleIds.zipWithIndex.foreach { case (sid, i) =>
            if (i + 1 < parts.length) {
              var value = pyStrip(parts(i + 1), "\"").trim
              if (value.contains(":")) value = value.split(":", 2)(1).trim
              characteristics(sid)(label) = value
            }
          }
        }
      }
    }

    def matchGroup(text: String): Option[String] = {
      val t = text.toLowerCase
      if (CancerKeywords.exists(t.contains)) Some("case")
      else if (BenignKeywords.exists(t.contains)) Some("control")
      else None
    }

    var groups: Map[String, String] = sampleIds.flatMap { sid =>
      val fromTissue = characteristics(sid).get("tissue").flatMap(matchGroup)
      val fromTitle = fromTissue.orElse {
        val i = sampleIds.indexOf(sid)
        if (i < titles.length) matchGroup(titles(i)) else None
      }
      val fromAny = fromTitle.orElse(
        matchGroup(characteristics(sid).values.mkString(" ")))
      fromAny.map(sid -> _)
    }.toMap

    val caseCount = groups.valuesIterator.count(_ == "case")
    val controlCount = groups.valuesIterator.count(_ == "control")
    if (caseCount < 2 || controlCount < 2) {
      // Default half/half split (`pipeline2.py:301-309`).
      val midpoint = sampleIds.length / 2
      groups = sampleIds.zipWithIndex.map { case (sid, i) =>
        sid -> (if (i < midpoint) "control" else "case")
      }.toMap
    }

    val schema = StructType(Seq(
      StructField("sample_id", StringType, nullable = false),
      StructField("ordinal", IntegerType, nullable = false),
      StructField("title", StringType, nullable = true),
      StructField("condition", StringType, nullable = true),
      StructField("characteristics",
        MapType(StringType, StringType), nullable = false)))
    val rows = sampleIds.zipWithIndex.map { case (sid, i) =>
      Row(sid, i, if (i < titles.length) titles(i) else null,
        groups.get(sid).orNull, characteristics(sid).toMap)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
