package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `format("graft-xml")` — a DataSource V2 implementation of the
  * reference's S1 operator: tag-delimited record carving with the exact
  * Mahout-style split-boundary rule
  * (/root/reference/src/PageRank/XmlInputFormat.java:21-122):
  *
  *   - each split scans for `<rowTag` only while its stream position is
  *     before the split end (XmlInputFormat.java:119 — the start-tag
  *     search stops at the boundary);
  *   - a record whose start tag falls inside the split is read to
  *     COMPLETION, past the split end if necessary (the within-block
  *     read at :111 ignores `end`);
  *   - so every record is emitted exactly once, by the split that
  *     contains its start tag, with no coordination between splits.
  *
  * Unlike the built-in XML source this reads RAW record blobs (one
  * `xml` string column) without requiring well-formed files or a root
  * element — exactly what the reference's job-1 mapper consumed; parse
  * with [[graft.wiki.WikiIngest.parsePageXml]]. At scale each split is
  * an independent `PartitionReader` over an HDFS-range read: no
  * single-reader bottleneck, no shuffle.
  *
  * Options: `path` (file or directory), `rowTag` (default `page`),
  * `maxSplitBytes` (default 128 MiB).
  */
class XmlRecordSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-xml"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XmlRecordSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new XmlRecordTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object XmlRecordSource {
  val Schema: StructType =
    StructType(Seq(StructField("xml", StringType, nullable = false)))
}

private class XmlRecordTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = s"graft-xml:${options.get("path")}"
  override def schema(): StructType = XmlRecordSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = XmlRecordSource.Schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val spark = SparkSession.active
        val path = Option(options.get("path")).getOrElse(
          throw new IllegalArgumentException("graft-xml requires a path"))
        val maxSplit = Option(options.get("maxSplitBytes"))
          .map(_.toLong).getOrElse(128L * 1024 * 1024)
        require(maxSplit > 0, s"maxSplitBytes must be > 0, got $maxSplit")
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = new Path(path).getFileSystem(conf)
        val files = {
          val p = new Path(path)
          val root = fs.getFileStatus(p)
          if (root.isDirectory) {
            // RECURSIVE listing: a real lake path is nested (partition
            // dirs, writer subdirs) — a flat listStatus would silently
            // drop every record under a subdirectory. Hidden files AND
            // files under hidden directories (_temporary, .staging) are
            // excluded, matching FileSourceScan conventions.
            def hidden(f: Path): Boolean = {
              var q = f
              var h = false
              while (q != null && q != root.getPath && !h) {
                val n = q.getName
                h = n.startsWith("_") || n.startsWith(".")
                q = q.getParent
              }
              h
            }
            val it = fs.listFiles(p, true)
            val out = ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
            while (it.hasNext) {
              val f = it.next()
              if (!hidden(f.getPath)) out += f
            }
            out.sortBy(_.getPath.toString).toSeq // deterministic split order
          } else Seq(root)
        }
        val splits = ArrayBuffer.empty[InputPartition]
        for (f <- files; off <- 0L until math.max(f.getLen, 1L) by maxSplit)
          splits += XmlSplit(f.getPath.toString, off,
            math.min(maxSplit, f.getLen - off))
        splits.toArray
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        val rowTag = Option(options.get("rowTag")).getOrElse("page")
        val conf = new SerializableConfiguration(
          SparkSession.active.sparkContext.hadoopConfiguration)
        XmlReaderFactory(rowTag, conf)
      }
    }
}

private case class XmlSplit(path: String, start: Long, length: Long)
    extends InputPartition

private case class XmlReaderFactory(rowTag: String,
                                    conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[XmlSplit]
    new XmlRecordReader(s, s"<$rowTag".getBytes(UTF_8),
      s"</$rowTag>".getBytes(UTF_8), conf)
  }
}

/** The port of XmlRecordReader (XmlInputFormat.java:33-122): byte-level
  * tag scanning over an HDFS range read. */
private class XmlRecordReader(split: XmlSplit, startTag: Array[Byte],
                              endTag: Array[Byte],
                              conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val end = split.start + split.length
  // The reference read one byte per unbuffered FSDataInputStream.read()
  // call — faithful but a hot-path syscall per byte at 100 TB. We wrap in
  // a BufferedInputStream and track the stream position ourselves (the
  // buffer makes the underlying getPos run ahead of the bytes consumed),
  // keeping the byte-for-byte boundary semantics identical.
  private val in: java.io.InputStream = {
    val path = new Path(split.path)
    val stream: FSDataInputStream = path.getFileSystem(conf.value).open(path)
    stream.seek(split.start)
    new java.io.BufferedInputStream(stream, 64 * 1024)
  }
  private var pos: Long = split.start
  private var current: UTF8String = _

  override def next(): Boolean = {
    // find a start tag beginning before the split end (:63, :119)
    if (!readUntilMatch(startTag, withinBlock = false, null)) return false
    val buf = new ByteArrayOutputStream(4096)
    buf.write(startTag)
    // read the record to completion, past `end` if needed (:66-69, :111)
    if (!readUntilMatch(endTag, withinBlock = true, buf)) return false
    current = UTF8String.fromBytes(buf.toByteArray)
    true
  }

  override def get(): InternalRow = InternalRow(current)
  override def close(): Unit = in.close()

  /** XmlInputFormat.readUntilMatch (:104-121), byte for byte: scan for
    * `tag`; outside a block, give up once past the split end with no
    * partial match in progress. */
  private def readUntilMatch(tag: Array[Byte], withinBlock: Boolean,
                             buf: ByteArrayOutputStream): Boolean = {
    var i = 0
    while (true) {
      val b = in.read()
      if (b == -1) return false // end of file (:107-108)
      pos += 1
      if (buf != null) buf.write(b) // save to buffer within block (:110-111)
      if (b == tag(i)) { // check if we're matching (:113-116)
        i += 1
        if (i >= tag.length) return true
      } else i = 0
      // see if we've passed the stop point (:118-120)
      if (!withinBlock && i == 0 && pos >= end) return false
    }
    false
  }
}
