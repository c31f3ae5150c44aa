package graft.wiki

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

/** End-to-end CLI pipeline: raw rootless dump on disk → graft-xml read →
  * link graph → 8 PageRank iterations → iteration-1 snapshot (job12) →
  * final thresholded rank text (job13) — the full wiring of the
  * reference's `PageRank.main` (PageRank.java:422-498), checked by
  * reading back both artifacts.
  */
class WikiPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def readRankLines(path: String): Seq[(String, Double)] =
    Files.list(Paths.get(path)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(f => Files.readAllLines(f).asScala)
      .map { line =>
        val Array(page, rank) = line.split("\t")
        (page, rank.toDouble)
      }.toSeq

  test("full pipeline produces iter1 + iter8 + snapshot artifacts") {
    val input = WikiDump.materializedDump(spark, sf)
    val out = Files.createTempDirectory("graft-pipeline").toString

    val n = WikiPipeline.run(spark, input, out)

    val expectedN = Tables.part(spark, sf).count() +
      Tables.supplier(spark, sf).count() + 1 // + the hub page
    assert(n == expectedN)

    // job13 artifact: rank > 5/N pages, globally descending
    val finalRanks = readRankLines(s"$out/iter8")
    assert(finalRanks.nonEmpty)
    assert(finalRanks.head._1 == "hub") // the hub concentrates rank mass
    assert(finalRanks.forall(_._2 > 5.0 / n))
    assert(finalRanks.map(_._2) == finalRanks.map(_._2).sorted.reverse)

    // job12 artifact: iteration-1 ordered text (suppliers still hold
    // their un-decayed first-iteration mass, so more pages clear 5/N)
    val iter1Ranks = readRankLines(s"$out/iter1")
    assert(iter1Ranks.nonEmpty)
    assert(iter1Ranks.forall(_._2 > 5.0 / n))

    // iteration-1 parquet snapshot: one row per page under iter=1
    val snap = spark.read.parquet(s"$out/snapshots")
    assert(snap.filter(col("iter") === 1).count() == n)

    // job3's `N =` artifact, byte-shaped like the reference's NReducer
    val nLines = Files.list(Paths.get(s"$out/n")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(f => Files.readAllLines(f).asScala).toSeq
    assert(nLines == Seq(s"N =\t$n"))
  }

  test("pipeline reads a .bz2-compressed dump identically (missing #1)") {
    // the first thing a real user does: point the pipeline at
    // enwiki-…-pages-articles.xml.bz2
    val plainDir = WikiDump.materializedDump(spark, sf)
    val bzDir = Files.createTempDirectory("graft-pipeline-bz").toString
    val plain = Files.list(Paths.get(plainDir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.toString)
      .flatMap(f => Files.readAllLines(f).asScala)
      .mkString("\n").getBytes("UTF-8")
    val bz = new java.io.ByteArrayOutputStream()
    val c = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bz, 1)
    c.write(plain); c.close()
    Files.write(Paths.get(bzDir, "dump.xml.bz2"), bz.toByteArray)

    val outPlain = Files.createTempDirectory("graft-pipe-plain").toString
    val outBz = Files.createTempDirectory("graft-pipe-bz").toString
    val nPlain = WikiPipeline.run(spark, plainDir, outPlain)
    val nBz = WikiPipeline.run(spark, bzDir, outBz)
    assert(nBz == nPlain)
    assert(readRankLines(s"$outBz/iter8").toSet ==
      readRankLines(s"$outPlain/iter8").toSet)
  }
}
