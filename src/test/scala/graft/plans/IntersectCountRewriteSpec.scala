package graft.plans

import org.apache.spark.sql.functions._

import graft.{GraftFunctions, SparkSpec}
import graft.functions.SortedIntersectCount

class IntersectCountRewriteSpec extends SparkSpec {

  // parquet-backed input: a literal Seq would be constant-folded into a
  // LocalRelation by the optimizer before the rule could be observed
  private def pairs = {
    GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(10).select(col("doc_id"), col("text"))
    docs.as("x").join(docs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(
        call_function("word_shingle_hashes",
          split(col("x.text"), " "), lit(2)).as("h1"),
        call_function("word_shingle_hashes",
          split(col("y.text"), " "), lit(2)).as("h2"))
  }

  test("rewrites size∘array_intersect of shingle-hash expressions, result unchanged") {
    val df = pairs.select(size(array_intersect(col("h1"), col("h2"))).as("n"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val rewritten = IntersectCountRewrite(optimized)
    val found = rewritten.expressions.flatMap(_.collect {
      case e: SortedIntersectCount => e
    })
    assert(found.nonEmpty, s"no SortedIntersectCount in:\n$rewritten")

    // semantics preserved vs the un-rewritten plan
    val expected = df.collect().map(_.getInt(0)).toSeq
    val s = spark
    import s.implicits._
    val viaNative = pairs.select(
      call_function("sorted_intersect_count", col("h1"), col("h2")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(expected == viaNative)
    assert(expected.nonEmpty)
  }

  test("does not fire on arbitrary (unproven) array columns") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(3L, 1L), Seq(1L, 2L))).toDF("a", "b")
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    val rewritten = IntersectCountRewrite(df.queryExecution.analyzed)
    val found = rewritten.expressions.flatMap(_.collect {
      case e: SortedIntersectCount => e
    })
    assert(found.isEmpty)
  }

  test("a session built withExtensions(GraftExtensions) applies the rule end-to-end") {
    import org.apache.spark.sql.SparkSession
    spark // force shared session (and its SparkContext) to exist first
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new SparkSession on the same SparkContext; withExtensions is the
      // programmatic form of spark.sql.extensions=graft.GraftExtensions
      // (the static conf only applies when the SparkContext is created)
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      val docs = graft.Tables.documents(s2, "/root/testdata/sf0.001")
        .limit(5).select(col("doc_id"), col("text"))
      val df = docs.as("x").join(docs.as("y"), col("x.doc_id") < col("y.doc_id"))
        .select(
          call_function("word_shingle_hashes",
            split(col("x.text"), " "), lit(2)).as("h1"),
          call_function("word_shingle_hashes",
            split(col("y.text"), " "), lit(2)).as("h2"))
        .select(size(array_intersect(col("h1"), col("h2"))).as("n"))
      val found = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
        case e: SortedIntersectCount => e
      })
      assert(found.nonEmpty,
        s"rule not applied by extensions session:\n${df.queryExecution.optimizedPlan}")
      assert(df.count() == 10) // 5 choose 2 pairs flow through the rewrite
    } finally {
      SparkSession.clearActiveSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }
}
