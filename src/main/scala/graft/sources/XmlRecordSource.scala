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
        // Compressed dumps (the form real MediaWiki dumps ship in —
        // enwiki-…-pages-articles.xml.bz2): bzip2 is splittable at its
        // compressed-block markers, so it gets byte-range splits like
        // raw XML; gzip & friends are stream-ciphers with no sync
        // points, so they fall back to ONE whole-file split (correct,
        // just not parallel within the file).
        val codecs = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
        val splits = ArrayBuffer.empty[InputPartition]
        for (f <- files) {
          val mode = codecs.getCodec(f.getPath) match {
            case null => XmlSplit.Raw
            case _: org.apache.hadoop.io.compress.SplittableCompressionCodec =>
              XmlSplit.SplitCompressed
            case _ => XmlSplit.WholeCompressed
          }
          if (mode == XmlSplit.WholeCompressed)
            splits += XmlSplit(f.getPath.toString, 0L, math.max(f.getLen, 1L), mode)
          else
            for (off <- 0L until math.max(f.getLen, 1L) by maxSplit)
              splits += XmlSplit(f.getPath.toString, off,
                math.min(maxSplit, f.getLen - off), mode)
        }
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

private case class XmlSplit(path: String, start: Long, length: Long,
                            mode: Byte = XmlSplit.Raw)
    extends InputPartition

private object XmlSplit {
  val Raw: Byte = 0             // uncompressed: byte-range splits
  val SplitCompressed: Byte = 1 // bzip2: compressed-block-range splits
  val WholeCompressed: Byte = 2 // gzip etc.: one split per file
}

private case class XmlReaderFactory(rowTag: String,
                                    conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[XmlSplit]
    new XmlRecordReader(s, s"<$rowTag".getBytes(UTF_8),
      s"</$rowTag>".getBytes(UTF_8), conf)
  }
}

/** Buffer-resident byte scanner with a 1-byte pushback slot — the
  * single final class replacing the PushbackInputStream-over-
  * BufferedInputStream stack, which cost two virtual calls per byte on
  * the carve hot path (VERDICT r5). One bulk `read(byte[])` per refill;
  * the per-byte path is a bounds check on a local array in a
  * monomorphic (JIT-inlinable) call site. `bufSize = 1` degrades to
  * exact per-byte reads of the underlying stream — used by the bzip2
  * BYBLOCK mode, where read-ahead would decouple consumed bytes from
  * the stream's `getPos` block-marker discipline.
  */
private final class ScanBuffer(in: java.io.InputStream, bufSize: Int) {
  private val buf = new Array[Byte](bufSize)
  private var lo = 0
  private var hi = 0
  private var pb = -1

  def read(): Int = {
    if (pb >= 0) { val b = pb; pb = -1; return b }
    if (lo >= hi) {
      // retry on a legal-but-unusual 0-length refill (ADVICE r6):
      // InputStream.read may return 0 without meaning EOF; treating it
      // as EOF would silently truncate record carving mid-split
      hi = 0
      while (hi == 0) hi = in.read(buf, 0, bufSize)
      lo = 0
      if (hi < 0) return -1
    }
    val b = buf(lo) & 0xff
    lo += 1
    b
  }

  def unread(b: Int): Unit = pb = b
  def close(): Unit = in.close()
}

/** The port of XmlRecordReader (XmlInputFormat.java:33-122): byte-level
  * tag scanning over an HDFS range read. */
private class XmlRecordReader(split: XmlSplit, startTag: Array[Byte],
                              endTag: Array[Byte],
                              conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val end = split.start + split.length
  private var decompressor: org.apache.hadoop.io.compress.Decompressor = _
  // The reference read one byte per unbuffered FSDataInputStream.read()
  // call — faithful but a hot-path syscall per byte at 100 TB. We scan a
  // 64 KiB buffer ([[ScanBuffer]]) and track the stream position
  // ourselves (read-ahead makes the underlying getPos run ahead of the
  // bytes consumed), keeping the byte-for-byte boundary semantics
  // identical.
  //
  // Compressed modes: a bzip2 split stream (BYBLOCK) starts at the first
  // compressed-block marker ≥ split.start and reports getPos as the
  // marker offset of the block currently being read — so "scan for start
  // tags while getPos < end, read records to completion past it" makes
  // each block owned by exactly one split (start ≤ marker < end), the
  // compressed analogue of the Mahout rule. No read-ahead there
  // (bufSize = 1): it would decouple the bytes we consume from getPos.
  private val streamAndGuard: (ScanBuffer, () => Boolean) = {
    val path = new Path(split.path)
    val stream: FSDataInputStream = path.getFileSystem(conf.value).open(path)
    import org.apache.hadoop.io.compress._
    split.mode match {
      case XmlSplit.Raw =>
        stream.seek(split.start)
        (new ScanBuffer(stream, 64 * 1024), () => pos >= end)
      case XmlSplit.SplitCompressed =>
        val codec = new CompressionCodecFactory(conf.value).getCodec(path)
        decompressor = CodecPool.getDecompressor(codec)
        val scis = codec.asInstanceOf[SplittableCompressionCodec]
          .createInputStream(stream, decompressor, split.start, end,
            SplittableCompressionCodec.READ_MODE.BYBLOCK)
        (new ScanBuffer(scis, 1), () => scis.getPos >= end)
      case _ => // WholeCompressed: decompress the file end to end
        val codec = new CompressionCodecFactory(conf.value).getCodec(path)
        decompressor = CodecPool.getDecompressor(codec)
        (new ScanBuffer(
          codec.createInputStream(stream, decompressor), 64 * 1024),
          () => false)
    }
  }
  private val in: ScanBuffer = streamAndGuard._1
  private val pastEnd: () => Boolean = streamAndGuard._2
  private var pos: Long = split.start
  private var current: UTF8String = _

  override def next(): Boolean = {
    // only begin a NEW record while still inside the split
    // (XmlInputFormat.java:59-63)
    if (pastEnd()) return false
    while (true) {
      // find a start-tag PREFIX beginning before the split end (:63, :119)
      if (!readUntilMatch(startTag, withinBlock = false, null)) return false
      // The reference matched the full configured string `<page>`
      // (XmlInputFormat.java:63, PageRank.java:430-431); matching the
      // bare prefix would also fire on sibling elements like <pagex> /
      // <pagelinks>, mis-carving a bogus record to the next </page>.
      // We admit attributes but demand the spark-xml terminator
      // convention: the prefix must be followed by '>', whitespace,
      // or '/' to count as a record start.
      val t = in.read()
      if (t != -1) pos += 1
      t match {
        case '>' =>
          val buf = new ByteArrayOutputStream(4096)
          buf.write(startTag); buf.write(t)
          // read the record to completion, past `end` if needed (:66-69, :111)
          if (readUntilMatch(endTag, withinBlock = true, buf)) {
            current = UTF8String.fromBytes(buf.toByteArray)
            return true
          } else return false
        case ' ' | '\t' | '\n' | '\r' =>
          // attribute section: scan to the closing '>' of the opening
          // tag; `.../>` is a complete self-closed record, `...>` reads
          // on to the end tag
          val buf = new ByteArrayOutputStream(4096)
          buf.write(startTag); buf.write(t)
          var prev = t
          var b = in.read()
          while (b != -1 && b != '>') { pos += 1; buf.write(b); prev = b; b = in.read() }
          if (b == -1) return false
          pos += 1; buf.write(b)
          if (prev == '/') { // self-closing, e.g. <page id="3"/>
            current = UTF8String.fromBytes(buf.toByteArray)
            return true
          }
          if (readUntilMatch(endTag, withinBlock = true, buf)) {
            current = UTF8String.fromBytes(buf.toByteArray)
            return true
          } else return false
        case '/' =>
          val u = in.read()
          if (u == '>') { // bare self-closing <page/>
            pos += 1
            val buf = new ByteArrayOutputStream(16)
            buf.write(startTag); buf.write('/'); buf.write('>')
            current = UTF8String.fromBytes(buf.toByteArray)
            return true
          }
          if (u != -1) in.unread(u) // not a tag end — keep scanning
        case -1 => return false
        case other =>
          // <pagex>, <pagelinks>, ... — not our tag; the byte may open
          // the next candidate (`<`), so reconsider it
          in.unread(other); pos -= 1
      }
    }
    false
  }

  override def get(): InternalRow = InternalRow(current)
  override def close(): Unit = {
    in.close()
    if (decompressor != null)
      org.apache.hadoop.io.compress.CodecPool.returnDecompressor(decompressor)
  }

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
      if (!withinBlock && i == 0 && pastEnd()) return false
    }
    false
  }
}
