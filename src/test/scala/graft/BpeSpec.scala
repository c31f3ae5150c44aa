package graft

import org.apache.spark.sql.functions._

/** q_text_tokens_bpe: ordered-merge application hand-checked. */
class BpeSpec extends SparkSpec {

  test("BPE merge chain: rank order, earlier-merge references, whitespace isolation") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the cat"), (2L, "that is"), (3L, "a"), (4L, ""))
      .toDF("doc_id", "text")
    val out = queries.TextQueries.queries("q_text_tokens_bpe")(s, writeDocs(df))
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap

    // "the cat": t+h→th, th+e→the (rule 2 references rule 1's output);
    // c+a stays (no rule), a+t→at → tokens: the, ' ', c, at = 4
    assert(out(1L) === 4L)
    // "that is": th→th, a+t→at, th+at→that (rule 25 references both);
    // i+s→is → tokens: that, ' ', is = 3
    assert(out(2L) === 3L)
    assert(out(3L) === 1L)
    assert(out(4L) === 0L)
  }

  private def writeDocs(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    df.withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
}
