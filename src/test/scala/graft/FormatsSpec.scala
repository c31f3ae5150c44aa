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

  /** Schema-drift guard for the driver's testdata (VERDICT r11 item 6):
    * the 2026-08-13 regeneration silently flipped events.ts from
    * TIMESTAMP(NANOS) to TIMESTAMP_MICROS and nothing in `sbt test`
    * named the drift. This pins every Tables.* loader's column names and
    * dtypes against the LIVE testdata dir — the next silent regeneration
    * of any table fails here with the table and column spelled out.
    * events.ts is asserted as TimestampType: that is the post-adapter
    * contract every downstream encoder relies on, whichever physical
    * type the parquet carries. */
  test("driver table schemas match the data contract") {
    import org.apache.spark.sql.types._
    val dir = "/root/testdata/sf0.001"
    val expected: Seq[(String, org.apache.spark.sql.DataFrame, Seq[(String, DataType)])] = Seq(
      ("region", Tables.region(spark, dir),
        Seq("r_regionkey" -> IntegerType, "r_name" -> StringType)),
      ("nation", Tables.nation(spark, dir),
        Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
          "n_regionkey" -> IntegerType)),
      ("customer", Tables.customer(spark, dir),
        Seq("c_custkey" -> LongType, "c_name" -> StringType,
          "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
          "c_mktsegment" -> StringType)),
      ("supplier", Tables.supplier(spark, dir),
        Seq("s_suppkey" -> LongType, "s_name" -> StringType,
          "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)),
      ("part", Tables.part(spark, dir),
        Seq("p_partkey" -> LongType, "p_name" -> StringType,
          "p_brand" -> StringType, "p_type" -> StringType,
          "p_size" -> IntegerType, "p_retailprice" -> DoubleType)),
      ("orders", Tables.orders(spark, dir),
        Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
          "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
          "o_orderdate" -> TimestampNTZType,
          "o_orderpriority" -> StringType)),
      ("lineitem", Tables.lineitem(spark, dir),
        Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
          "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
          "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
          "l_discount" -> DoubleType, "l_tax" -> DoubleType,
          "l_returnflag" -> StringType, "l_linestatus" -> StringType,
          "l_shipdate" -> TimestampNTZType)),
      ("events", Tables.events(spark, dir),
        Seq("event_id" -> LongType, "ts" -> TimestampType,
          "user_id" -> LongType, "event_type" -> StringType,
          "value" -> DoubleType, "props" -> StringType)),
      ("documents", Tables.documents(spark, dir),
        Seq("doc_id" -> LongType, "text" -> StringType,
          "lang" -> StringType, "source" -> StringType,
          "n_chars" -> LongType)),
      ("embeddings", Tables.embeddings(spark, dir),
        Seq("vec_id" -> LongType,
          "embedding" -> ArrayType(FloatType, containsNull = true),
          "label" -> IntegerType))
    )
    val drift = expected.flatMap { case (name, df, cols) =>
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      if (actual == cols) None
      else Some(s"$name: expected $cols, got $actual")
    }
    assert(drift.isEmpty, s"schema drift:\n${drift.mkString("\n")}")
  }
}
