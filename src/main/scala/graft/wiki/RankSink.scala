package graft.wiki

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S3: reference-shaped text sinks
  * (/root/reference/src/PageRank/PageRank.java: TextOutputFormat at
  * 445, 513, 535, 558, 582 — `key \t value` lines).
  *
  * The reference's final artifact is one globally descending-rank file
  * (single logical reducer via FlipComparator, PageRank.java:566-588).
  * Spark equivalent: range-partitioned total sort, then coalesce(1) ON
  * THE WRITE ONLY — never mid-pipeline (SURVEY.md §7.5.6). For
  * production-size outputs drop the coalesce and ship N sorted parts;
  * part file ordering preserves the global sort.
  */
object RankSink {

  /** `page \t rank` lines, rank in Java Double.toString shortest form
    * like the reference's `Double.toString` round-trip
    * (PageRank.java:322). */
  def writeRankedText(ranks: DataFrame, path: String,
                      singleFile: Boolean = true): Unit = {
    val lines = ranks
      .orderBy(col("rank").desc, col("page"))
      .select(concat_ws("\t", col("page"), col("rank").cast("string"))
        .as("value"))
    (if (singleFile) lines.coalesce(1) else lines)
      .write.mode("overwrite").text(path)
  }

  /** Partitioned parquet sink for the rank snapshots a production run
    * would keep (partition column → directory pruning on read). */
  def writeSnapshot(ranks: DataFrame, path: String, iteration: Int): Unit =
    ranks.withColumn("iter", lit(iteration))
      .write.mode("append").partitionBy("iter").parquet(path)
}
