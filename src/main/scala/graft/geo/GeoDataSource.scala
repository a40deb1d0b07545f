package graft.geo

import java.io.{BufferedReader, InputStreamReader}
import java.util
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 `geo` format: `spark.read.format("geo").load(path)` yields
  * the long-form expression table (probe_id, sample_id, value) straight
  * from a GEO Series Matrix text file (gzip-aware) — the TableProvider
  * upgrade of the S1–S3 parsing layer (SURVEY §4.2 item 3). Parse
  * semantics are shared with [[GeoMatrixReader]] via [[GeoLineParser]]
  * and pinned equal by the spec.
  *
  * One input partition per file: the format is line-stateful only in its
  * header (sample ids), which each reader re-reads from its file head —
  * data rows then stream. Gzip files are unsplittable anyway; for huge
  * uncompressed matrices the [[GeoMatrixReader]] path (spark.read.text +
  * column expressions) remains the split-parallel option.
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
    new GeoScanBuilder(Option(options.get("path")).getOrElse(path))
}

final class GeoScanBuilder(path: String) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = GeoDataSource.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, new Configuration())
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
          .filterNot(f => f.startsWith("_") || f.startsWith("."))
      else Array(path)
    files.sorted.map(f => GeoInputPartition(f): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GeoReaderFactory
}

final case class GeoInputPartition(file: String) extends InputPartition

final class GeoReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GeoPartitionReader(partition.asInstanceOf[GeoInputPartition].file)
}

/** Streams one file: header pass fixes the sample ids, then each data
  * row fans out to n (probe, sample, value) rows. */
final class GeoPartitionReader(file: String) extends PartitionReader[InternalRow] {
  private val reader: BufferedReader = {
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, new Configuration())
    val in = fs.open(p)
    val stream =
      if (file.endsWith(".gz")) new GZIPInputStream(in) else in
    new BufferedReader(new InputStreamReader(stream, "UTF-8"))
  }
  private var sampleIds: Array[UTF8String] = _
  private var current: (UTF8String, Array[java.lang.Double]) = _
  private var idx = 0
  private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)

  private def ensureHeader(): Boolean = {
    if (sampleIds != null) return true
    var line = reader.readLine()
    while (line != null && !GeoLineParser.isHeader(line)) line = reader.readLine()
    if (line == null) return false
    sampleIds = GeoLineParser.parseHeader(line)
      .map(UTF8String.fromString).toArray
    sampleIds.nonEmpty
  }

  override def next(): Boolean = {
    if (!ensureHeader()) return false
    while (current == null || idx >= sampleIds.length) {
      val line = reader.readLine()
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
  override def close(): Unit = reader.close()
}
