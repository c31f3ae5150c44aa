package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashMergeAggSpec extends SparkSpec {

  test("element-wise min across group members; nulls carry no information") {
    val s = spark
    import s.implicits._
    val merge = udaf(new MinHashMergeAgg(3))
    val df = Seq(
      ("a", Seq(5L, 1L, 9L)),
      ("a", Seq(2L, 7L, 9L)),
      ("a", null.asInstanceOf[Seq[Long]]),
      ("b", Seq(4L, 4L, 4L))
    ).toDF("g", "sig")
    val got = df.groupBy("g").agg(merge(col("sig")).as("m"))
      .orderBy("g").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(2L, 1L, 9L))
    assert(got("b") == Seq(4L, 4L, 4L))
  }

  test("merge is associative: repartitioned input gives the same sketch") {
    val s = spark
    import s.implicits._
    val merge = udaf(new MinHashMergeAgg(4))
    val rows = (1 to 100).map(i =>
      ("g", Seq(i.toLong, (101 - i).toLong, (i * 7 % 50).toLong, 99L)))
    val base = rows.toDF("g", "sig")
    val r1 = base.repartition(1).groupBy("g").agg(merge(col("sig"))).head.getSeq[Long](1)
    val r7 = base.repartition(7).groupBy("g").agg(merge(col("sig"))).head.getSeq[Long](1)
    assert(r1 == r7)
    assert(r1 == Seq(1L, 1L, 0L, 99L))
  }
}
