package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries

/** The `preLen` knob on [[DedupQueries.editdistPairs]]: the compared
  * prefix bounds the per-pair DP cost (preLen² — the documented scale
  * bargain), and this spec records the precision difference a user buys
  * by raising it: documents identical through char 40 but divergent
  * after are dist-0 "near-dups" at the default and correctly drop out
  * at preLen = 80.
  */
class EditDistPreLenSpec extends SparkSpec {

  test("pairs identical through char 40 are dist-0 at the default and drop at preLen=80") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("editdist-prelen").toString
    val shared = "the shared boilerplate opening of forty." // 40 chars
    assert(shared.length == 40)
    // 1 vs 2: same first 40 chars, 40 substitutions after → true edit
    // distance 40; 1 vs 3: genuinely near-identical end to end (1 edit)
    val t1 = shared + ("x" * 40)
    val t2 = shared + ("q" * 40)
    val t3 = shared + ("x" * 39) + "y"
    Seq((1L, t1), (2L, t2), (3L, t3)).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("source", lit("web"))
      .write.parquet(s"$dir/documents.parquet")

    def pairs(preLen: Int): Map[(Long, Long), Long] =
      DedupQueries.editdistPairs(spark, dir, blockCap = 1000, preLen = preLen)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val p40 = pairs(40)
    // at the default every pair collapses to the shared prefix
    assert(p40 == Map((1L, 2L) -> 0L, (1L, 3L) -> 0L, (2L, 3L) -> 0L))

    val p80 = pairs(80)
    // the full-length DP separates the false pair (dist 40 > 12) from
    // the true near-dup (dist 1)
    assert(p80 == Map((1L, 3L) -> 1L))
  }
}
