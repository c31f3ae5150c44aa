package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def sigsOf(texts: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    texts.toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), "\\s+"))
      .withColumn("sh", expr(Dedup.wordShinglesExpr("toks", 3)))
      .withColumn("hs", expr(Dedup.shingleHash32Expr("sh")))
      .withColumn("sig", expr(Dedup.minhashExpr("hs", 16)))
  }

  test("minhash: identical docs get identical signatures; disjoint docs differ") {
    val df = sigsOf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words in this one entirely unlike anything before")))
    val sigs = df.select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("minhash similarity tracks Jaccard: near-dup docs share most slots") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val b = a + " omicron" // one extra token → most shingles shared
    val df = sigsOf(Seq((1L, a), (2L, b)))
    val sigs = df.select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val shared = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }
    assert(shared >= 12, s"expected most of 16 slots shared, got $shared")
  }

  test("simhash: near-identical docs land within small Hamming distance") {
    val s = spark
    import s.implicits._
    val a = "spark catalyst tungsten shuffle partition broadcast join aggregate window stream"
    val b = a + " extra"
    val c = "entirely unrelated vocabulary nothing matches here at all believe me truly"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
      .withColumn("ths", expr(Dedup.tokenHashesExpr("text")))
      .select(col("doc_id"), expr(Dedup.simhashExpr("ths", 32)).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(m(1L), m(2L)) <= 6,
      s"near-dups too far: ${hamming(m(1L), m(2L))}")
    assert(hamming(m(1L), m(3L)) > hamming(m(1L), m(2L)))
  }

  test("jaccard on distinct arrays") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-15) // |{b,c}| / |{a,b,c,d}|
  }

  test("shingle exprs are total: empty and sub-width inputs yield empty/null") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, ""), (2L, "one"), (3L, "one two")).toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), "\\s+"))
      .withColumn("sh", expr(Dedup.wordShinglesExpr("toks", 3)))
      .withColumn("ch", expr(Dedup.charShinglesExpr("text", 5)))
      .withColumn("hs", expr(Dedup.shingleHash32Expr("sh")))
      .withColumn("sig", expr(Dedup.minhashExpr("hs", 16)))
    val rows = df.orderBy("doc_id")
      .select(size(col("sh")), size(col("ch")), col("sig")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == 0) // all inputs have < 3 tokens
      assert(r.isNullAt(2)) // no word shingles → null signature
    }
    // char shingles: "" and "one" are under k=5; "one two" (7 chars) has 3
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 0, 3))
  }
}
