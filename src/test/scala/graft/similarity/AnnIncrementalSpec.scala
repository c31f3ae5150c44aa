package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.SimilarityQueries

/** `q_ann_incremental` — appending a new dump's vectors to the
  * standing ANN store must never change an answer: encode is per-row
  * under frozen quantizers, so encode(standing) ∪ encode(new) ≡
  * encode(full) and the search equals the full stored index row for
  * row. Also pins the store partition (the standing table holds
  * exactly the below-threshold ids) and that the query-time encode's
  * scan pushes the high-water-mark range down to parquet — the
  * standing corpus's bytes are never read to serve an append. */
class AnnIncrementalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("incremental search == full stored index, row for row") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val inc = rows("q_ann_incremental")
    val full = rows("q_ann_ivfpq_stored")
    assert(inc.nonEmpty)
    assert(inc == full,
      s"incremental (${inc.size}) diverged from full stored (${full.size})")
  }

  test("standing store holds exactly the below-threshold ids; " +
      "the new slice is non-trivial") {
    val thr = SimilarityQueries.incVecThreshold(spark, dir)
    val all = Tables.embeddings(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val standing = SimilarityQueries.annStoreStanding(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(standing == all.filter(_ < thr),
      "standing store != below-threshold id set")
    val newIds = all.filter(_ >= thr)
    assert(newIds.nonEmpty, "the new dump is empty — the gate is vacuous")
    assert(standing.nonEmpty, "the standing store is empty")
  }

  test("the query-time encode scan pushes the range to parquet") {
    val thr = SimilarityQueries.incVecThreshold(spark, dir)
    val plan = Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= thr)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(vec_id"),
      s"high-water-mark range not pushed to the scan:\n${plan.take(1500)}")
  }
}
