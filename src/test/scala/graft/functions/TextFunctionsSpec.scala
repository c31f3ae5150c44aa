package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  test("subword count: letter runs, digit runs, single symbols") {
    val s = spark
    import s.implicits._
    val got = Seq("abc de 42 x!y", "hello", "12 34").toDF("text")
      .select(TextFunctions.subwordCount(col("text"))).collect().map(_.getInt(0))
    // "abc de 42 x!y" → abc, de, 42, x, !, y = 6
    assert(got.toSeq == Seq(6, 1, 2))
  }

  test("winnowing: insertion changes few fingerprints, disjoint text shares none") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps running far"
    val edited = base.replace("jumps", "leaps")
    val other = "totally different content with zero overlap whatsoever in any gram"
    val df = Seq((1L, base), (2L, edited), (3L, other)).toDF("id", "text")
      .withColumn("hs", expr(TextFunctions.shingleHashesExpr("text", 8)))
      .withColumn("fps", expr(TextFunctions.winnowExpr("hs", 4)))
    val fp = df.select(col("id"), col("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val j12 = fp(1L).intersect(fp(2L)).size.toDouble / fp(1L).union(fp(2L)).size
    val j13 = fp(1L).intersect(fp(3L)).size.toDouble / fp(1L).union(fp(3L)).size
    assert(j12 > 0.5, s"local edit should preserve most fingerprints, j=$j12")
    assert(j13 == 0.0)
  }

  test("hash32 is stable and matches the DuckDB formula") {
    val s = spark
    import s.implicits._
    // first 8 hex of md5('abc') = 90015098 → 2416005272 (probed in DuckDB)
    val got = Seq("abc").toDF("t")
      .select(TextFunctions.hash32(col("t"))).head().getLong(0)
    assert(got == 2416005272L)
  }
}
