package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.wiki.{WikiDump, WikiIngest}

/** The graft-xml DSv2 source must carve exactly one record per <page>
  * element, reading raw (rootless) concatenated-record files, with the
  * Mahout split rule: a record STARTING in a split is read to
  * completion past the split end; a record starting after the split end
  * belongs to the next split — no duplicates, no drops, at any split
  * size.
  */
class XmlRecordSourceSpec extends SparkSpec {

  private def writeDump(dir: String): Set[String] = {
    val xml = WikiDump.xml(spark, "/root/testdata/sf0.001")
      .collect().map(_.getString(0))
    // ONE big rootless file of concatenated records — the shape the
    // built-in XML source cannot read (it needs well-formed roots) but
    // the reference's XmlInputFormat consumed directly
    Files.write(Paths.get(dir, "dump.xml"),
      xml.mkString("\n").getBytes("UTF-8"))
    xml.toSet
  }

  test("reads every record exactly once from a rootless concatenated file") {
    val dir = Files.createTempDirectory("graftxml").toString
    val expected = writeDump(dir)
    val got = spark.read.format("graft-xml").option("path", s"$dir/dump.xml")
      .load().collect().map(_.getString(0)).toSet
    assert(got == expected)
  }

  test("split-boundary rule: tiny splits produce no duplicates and no drops") {
    val dir = Files.createTempDirectory("graftxml2").toString
    val expected = writeDump(dir)
    // 2 KB splits over a ~100 KB file → dozens of splits, records
    // routinely straddle boundaries
    val got = spark.read.format("graft-xml")
      .option("path", s"$dir/dump.xml").option("maxSplitBytes", "2048")
      .load().collect().map(_.getString(0))
    assert(got.length == expected.size, s"${got.length} vs ${expected.size}")
    assert(got.toSet == expected)
  }

  test("parses downstream identically to the column form") {
    val dir = Files.createTempDirectory("graftxml3").toString
    writeDump(dir)
    val viaSource = WikiIngest.parsePageXml(
      spark.read.format("graft-xml").option("path", s"$dir/dump.xml")
        .option("maxSplitBytes", "8192").load(), "xml")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaColumn = WikiIngest.parsePageXml(
      WikiDump.xml(spark, "/root/testdata/sf0.001"), "xml")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaSource == viaColumn)
    assert(viaSource.nonEmpty)
  }

  test("reads a directory of part files") {
    val dir = Files.createTempDirectory("graftxml4").toString
    val xml = WikiDump.xml(spark, "/root/testdata/sf0.001")
      .collect().map(_.getString(0))
    xml.grouped(80).zipWithIndex.foreach { case (part, i) =>
      Files.write(Paths.get(dir, s"part-$i.xml"),
        part.mkString("\n").getBytes("UTF-8"))
    }
    val got = spark.read.format("graft-xml").option("path", dir)
      .load().count()
    assert(got == xml.length)
  }

  test("empty file yields zero rows, truncated final record is dropped at EOF") {
    val dir = Files.createTempDirectory("graftxml7").toString
    Files.write(Paths.get(dir, "empty.xml"), Array.emptyByteArray)
    assert(spark.read.format("graft-xml")
      .option("path", s"$dir/empty.xml").load().count() == 0)
    // a record whose end tag never arrives: the reference's
    // readUntilMatch returns false at EOF (:107-108) and the partial
    // record is dropped — two complete records survive, the tail doesn't
    val txt = "<page><title>a</title></page>\n" +
      "<page><title>b</title></page>\n" +
      "<page><title>c</title>  ...truncated mid-record"
    Files.write(Paths.get(dir, "trunc.xml"), txt.getBytes("UTF-8"))
    val got = spark.read.format("graft-xml")
      .option("path", s"$dir/trunc.xml").load()
      .collect().map(_.getString(0))
    assert(got.length == 2)
    assert(got.forall(_.endsWith("</page>")))
  }

  test("rowTag option carves records of any tag, not just <page>") {
    val dir = Files.createTempDirectory("graftxml6").toString
    val recs = (1 to 25).map(i => s"<doc><id>$i</id><body>text $i</body></doc>")
    Files.write(Paths.get(dir, "docs.xml"),
      recs.mkString("\n").getBytes("UTF-8"))
    val got = spark.read.format("graft-xml").option("path", dir)
      .option("rowTag", "doc").option("maxSplitBytes", "256")
      .load().collect().map(_.getString(0))
    assert(got.length == recs.size)
    assert(got.toSet == recs.toSet)
  }

  test("recursive listing: nested partition dirs are read, hidden dirs skipped") {
    // a lake-shaped input: records nested two levels deep under partition
    // directories, plus a _temporary dir and a hidden file that must be
    // ignored — a flat listing would silently drop the nested records
    // (VERDICT r3 item 4)
    val dir = Files.createTempDirectory("graftxml5").toString
    val xml = WikiDump.xml(spark, "/root/testdata/sf0.001")
      .collect().map(_.getString(0))
    val (a, b) = xml.splitAt(xml.length / 2)
    Files.createDirectories(Paths.get(dir, "day=1", "hour=0"))
    Files.createDirectories(Paths.get(dir, "day=2"))
    Files.createDirectories(Paths.get(dir, "_temporary"))
    Files.write(Paths.get(dir, "day=1", "hour=0", "part-0.xml"),
      a.mkString("\n").getBytes("UTF-8"))
    Files.write(Paths.get(dir, "day=2", "part-0.xml"),
      b.mkString("\n").getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_temporary", "junk.xml"),
      a.take(3).mkString("\n").getBytes("UTF-8"))
    Files.write(Paths.get(dir, "day=2", ".hidden.xml"),
      a.take(3).mkString("\n").getBytes("UTF-8"))
    val got = spark.read.format("graft-xml").option("path", dir)
      .option("maxSplitBytes", "4096")
      .load().collect().map(_.getString(0))
    assert(got.length == xml.length, s"${got.length} vs ${xml.length}")
    assert(got.toSet == xml.toSet)
  }
}
