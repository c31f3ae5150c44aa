package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMVAggSpec extends SparkSpec {

  test("sketch keeps the k smallest distinct values regardless of partitioning") {
    val s = spark
    import s.implicits._
    val kmv = udaf(new KMVAgg(4))
    // duplicates + out-of-order + nulls
    val data: Seq[(String, java.lang.Long)] = Seq(
      ("g", 50L), ("g", 10L), ("g", 30L), ("g", 10L), ("g", 20L),
      ("g", 40L), ("g", null), ("g", 5L))
    for (parts <- Seq(1, 3, 8)) {
      val got = data.toDF("k", "h").repartition(parts)
        .groupBy("k").agg(kmv(col("h")).as("sk"))
        .head().getSeq[Long](1)
      assert(got == Seq(5L, 10L, 20L, 30L), s"parts=$parts got $got")
    }
  }

  test("groups with fewer than k distinct values return the exact set") {
    val s = spark
    import s.implicits._
    val kmv = udaf(new KMVAgg(64))
    val got = Seq(("g", 3L), ("g", 1L), ("g", 3L)).toDF("k", "h")
      .groupBy("k").agg(kmv(col("h")).as("sk"))
      .head().getSeq[Long](1)
    assert(got == Seq(1L, 3L))
  }

  test("estimate is within 15% of the true distinct count on md5 hashes") {
    val s = spark
    import s.implicits._
    val k = 64
    val kmv = udaf(new KMVAgg(k))
    val sk = s.range(10000)
      .select(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast("long").as("h"))
      .agg(kmv(col("h")).as("sk"))
      .head().getSeq[Long](0)
    val est = (k - 1).toDouble * 4294967296.0 / sk.last
    assert(math.abs(est - 10000) / 10000.0 < 0.15, s"est=$est")
  }
}
