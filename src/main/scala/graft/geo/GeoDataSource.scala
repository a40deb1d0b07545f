package graft.geo

import java.io.{BufferedReader, InputStreamReader}
import java.util
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.Text
import org.apache.hadoop.util.LineReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 `geo` format: `spark.read.format("geo").load(path)` yields
  * the long-form expression table (probe_id, sample_id, value) straight
  * from a GEO Series Matrix text file (gzip-aware) — the TableProvider
  * upgrade of the S1–S3 parsing layer (SURVEY §4.2 item 3). Parse
  * semantics are shared with [[GeoMatrixReader]] via [[GeoLineParser]]
  * and pinned equal by the spec.
  *
  * Partitioning: gzip files are unsplittable and plan one partition each;
  * uncompressed files split into byte ranges of `maxSplitBytes` (option;
  * defaults to the session's `spark.sql.files.maxPartitionBytes`) with
  * standard text-split semantics — a split skips its first partial line
  * unless it starts at byte 0 and consumes the line that straddles its
  * end. Every split re-reads the file head for the sample-id header
  * (bounded: the header sits above the data block in the format).
  *
  * The session's Hadoop configuration is carried to the scan planner and
  * the executor-side readers via [[SerializableConfiguration]], so fs
  * settings and credentials configured on the SparkSession apply.
  */
class GeoDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "geo"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GeoTable(properties.get("path"))
}

object GeoDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("probe_id", StringType, nullable = false),
    StructField("sample_id", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true)))
}

final class GeoTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"geo($path)"
  override def schema(): StructType = GeoDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeoScanBuilder(Option(options.get("path")).getOrElse(path), options)
}

final class GeoScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  private val confSer = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())
  private val maxSplitBytes: Long = math.max(1L,
    Option(options.get("maxSplitBytes")).map(_.toLong).getOrElse(
      SparkSession.active.sessionState.conf.filesMaxPartitionBytes))

  override def build(): Scan = this
  override def readSchema(): StructType = GeoDataSource.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(confSer.value)
    val stat = fs.getFileStatus(p)
    val files =
      if (stat.isDirectory)
        // Skip metadata/hidden files by FILE NAME (_SUCCESS, .crc, ...)
        // — the full path string always starts with a scheme, so a
        // path-string test would never match.
        fs.listStatus(p).filter(_.isFile).filterNot { s =>
          val n = s.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
      else Array(stat)
    files.sortBy(_.getPath.toString).flatMap { s =>
      val f = s.getPath.toString
      if (f.endsWith(".gz") || s.getLen == 0)
        Seq(GeoInputPartition(f, 0L, Long.MaxValue))
      else
        (0L until s.getLen by maxSplitBytes).map(st =>
          GeoInputPartition(f, st, math.min(maxSplitBytes, s.getLen - st)))
    }.map(x => x: InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GeoReaderFactory(confSer)
}

/** Byte range [start, start+length) of one file; standard text-split line
  * ownership (see [[GeoPartitionReader]]). Gzip files always get the full
  * range. */
final case class GeoInputPartition(file: String, start: Long, length: Long)
  extends InputPartition

final class GeoReaderFactory(confSer: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GeoInputPartition]
    new GeoPartitionReader(p.file, p.start, p.length, confSer.value)
  }
}

/** Streams one byte range of one file: a bounded head pass fixes the
  * sample ids, then data rows in the range fan out to n
  * (probe, sample, value) rows. Line ownership follows Hadoop text
  * splits: a reader starting past byte 0 discards its first (partial)
  * line, and a line is processed iff its first byte lies in
  * [start, end] — the straddling line at `end` is consumed whole here
  * and skipped by the next split. */
final class GeoPartitionReader(file: String, start: Long, length: Long,
                               conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val path = new Path(file)
  private val fs = path.getFileSystem(conf)
  private val gz = file.endsWith(".gz")
  private val end: Long =
    if (gz || length == Long.MaxValue) Long.MaxValue else start + length

  /** Sample ids from the file-head header scan; empty when the file has
    * no ID_REF header (then the split yields no rows, matching the
    * DataFrame path's explicit failure being handled by the caller).
    * The scan is BOUNDED (64 MB of head): the header precedes the data
    * block in the format and metadata blocks are dimension-sized, so a
    * real header always sits well inside the bound — while a multi-GB
    * headerless file dropped in the directory costs each split at most
    * the bound, not a full re-read per split. */
  private lazy val sampleIds: Array[UTF8String] = {
    val maxHeaderScanChars = 64L << 20
    val in = fs.open(path)
    val br = new BufferedReader(new InputStreamReader(
      if (gz) new GZIPInputStream(in) else in, "UTF-8"))
    try {
      var scanned = 0L
      var line = br.readLine()
      while (line != null && !GeoLineParser.isHeader(line) &&
             scanned <= maxHeaderScanChars) {
        scanned += line.length + 1
        line = br.readLine()
      }
      if (line != null && GeoLineParser.isHeader(line))
        GeoLineParser.parseHeader(line).map(UTF8String.fromString).toArray
      else if (line == null) Array.empty   // EOF: genuinely headerless file
      else
        // Bound hit with more file left: refuse loudly rather than return
        // an empty result for what may be a valid matrix with an
        // extraordinarily large metadata block.
        throw new IllegalStateException(
          s"no ID_REF header within the first $maxHeaderScanChars chars " +
            s"of $file — not a GEO series matrix, or its metadata block " +
            "exceeds the header-scan bound")
    } finally br.close()
  }

  private var lineReader: LineReader = _
  private var pos: Long = start
  private val text = new Text()
  private var current: (UTF8String, Array[java.lang.Double]) = _
  private var idx = 0
  private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)

  private def nextLine(): String = {
    if (lineReader == null) {
      val in = fs.open(path)
      if (gz) lineReader = new LineReader(new GZIPInputStream(in))
      else {
        if (start > 0) in.seek(start)
        lineReader = new LineReader(in)
        if (start > 0) pos += lineReader.readLine(text)   // discard partial line
      }
    }
    if (pos > end) return null
    val n = lineReader.readLine(text)
    if (n == 0) null else { pos += n; text.toString }
  }

  override def next(): Boolean = {
    if (sampleIds.isEmpty) return false
    while (current == null || idx >= sampleIds.length) {
      val line = nextLine()
      if (line == null) return false
      GeoLineParser.parseDataRow(line, sampleIds.length) match {
        case Some((probe, values)) =>
          current = (UTF8String.fromString(probe), values)
          idx = 0
        case None => ()
      }
    }
    row.update(0, current._1)
    row.update(1, sampleIds(idx))
    val v = current._2(idx)
    if (v == null) row.setNullAt(2) else row.update(2, v.doubleValue())
    idx += 1
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = if (lineReader != null) lineReader.close()
}
