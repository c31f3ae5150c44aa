package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Source/sink format breadth: the rank vector round-trips losslessly
  * through every self-describing format Spark ships (parquet, orc,
  * json-lines) and through csv with an explicit schema — doubles must
  * come back bit-for-bit (shortest-repr round-trip, SURVEY.md §7.5.5).
  */
class FormatsSpec extends SparkSpec {

  private lazy val ranks = {
    val s = spark
    import s.implicits._
    Seq(("a", 1.0 / 3.0), ("b", 0.15 / 7.0), ("c", 1e-17), ("d", 0.5))
      .toDF("page", "rank")
  }

  private def collectSorted(df: org.apache.spark.sql.DataFrame) =
    df.select("page", "rank").collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq

  test("parquet and orc round-trip doubles bit-for-bit") {
    val expected = collectSorted(ranks)
    for (fmt <- Seq("parquet", "orc")) {
      val dir = Files.createTempDirectory(s"graft-$fmt").toString
      ranks.write.mode("overwrite").format(fmt).save(dir)
      assert(collectSorted(spark.read.format(fmt).load(dir)) == expected, fmt)
    }
  }

  test("json-lines round-trip with explicit schema is lossless") {
    val dir = Files.createTempDirectory("graft-json").toString
    ranks.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(StructField("page", StringType),
      StructField("rank", DoubleType)))
    assert(collectSorted(spark.read.schema(schema).json(dir)) ==
      collectSorted(ranks))
  }

  test("csv with explicit schema round-trips shortest-repr doubles") {
    val dir = Files.createTempDirectory("graft-csv").toString
    ranks.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(StructField("page", StringType),
      StructField("rank", DoubleType)))
    assert(collectSorted(
      spark.read.schema(schema).option("header", "true").csv(dir)) ==
      collectSorted(ranks))
  }
}
