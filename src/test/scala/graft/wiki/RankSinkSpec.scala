package graft.wiki

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankSinkSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("ranksink").toString

  test("writeRankedText emits reference-shaped page\\trank lines, rank-descending") {
    val s = spark
    import s.implicits._
    val ranks = Seq(("a", 0.5), ("b", 0.25), ("c", 0.125)).toDF("page", "rank")
    val dir = tmp() + "/out"
    RankSink.writeRankedText(ranks, dir)
    val part = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(part.size == 1) // coalesce(1): one globally sorted file
    val lines = Files.readAllLines(part.head).asScala.toSeq
    assert(lines == Seq("a\t0.5", "b\t0.25", "c\t0.125"))
  }

  test("singleFile=false ships N sorted parts whose file order preserves the global sort") {
    val s = spark
    import s.implicits._
    // AQE coalesces a tiny sort to one partition by size; disable the
    // coalescing for this write so the range sort actually spreads over
    // multiple files, as a 100 TB output would
    val ranks = (1 to 400).map(i => (f"p$i%04d", 1.0 / i)).toDF("page", "rank")
    val dir = tmp() + "/multi"
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(key, "false")
    try RankSink.writeRankedText(ranks, dir, singleFile = false)
    finally spark.conf.unset(key)
    val parts = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)
    assert(parts.size > 1, s"expected multiple part files, got ${parts.size}")
    val all = parts.flatMap(f => Files.readAllLines(f).asScala)
      .map(_.split("\t")(1).toDouble)
    assert(all.size == 400)
    assert(all == all.sorted.reverse) // concatenation in filename order IS the global order
  }

  test("JSON-lines round trip preserves ranks bit-for-bit across write/read") {
    val s = spark
    import s.implicits._
    val dir = tmp() + "/json"
    val ranks = Seq(("a", 0.5), ("b", 1.0 / 3.0), ("c", 1e-12))
      .toDF("page", "rank")
    ranks.write.mode("overwrite").json(dir)
    // explicit schema: inference is an extra pass and can widen types
    val back = spark.read
      .schema("page STRING, rank DOUBLE").json(dir)
      .orderBy("page").collect().map(r => (r.getString(0), r.getDouble(1)))
    // Spark writes JSON doubles via shortest-round-trip formatting, so
    // the read-back double is bit-identical (including 1/3 and 1e-12)
    assert(back.toSeq == Seq(("a", 0.5), ("b", 1.0 / 3.0), ("c", 1e-12)))
  }

  test("partitioned snapshot write is partition-pruned on read") {
    val s = spark
    import s.implicits._
    val dir = tmp() + "/snaps"
    val r1 = Seq(("a", 0.5), ("b", 0.5)).toDF("page", "rank")
    val r2 = Seq(("a", 0.6), ("b", 0.4)).toDF("page", "rank")
    RankSink.writeSnapshot(r1, dir, 1)
    RankSink.writeSnapshot(r2, dir, 8)
    val read = spark.read.parquet(dir).filter(col("iter") === 8)
    assert(read.select("page", "rank").orderBy("page").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 0.6), ("b", 0.4)))
    // the iter=1 directory must not be scanned: partition filter present,
    // and the chosen files all come from iter=8
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(iter"),
      s"no partition filter in:\n$scan")
    val files = read.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.filter(_.contains("Location")))
    assert(!scan.contains("iter=1") || scan.contains("iter=8"))
  }
}
