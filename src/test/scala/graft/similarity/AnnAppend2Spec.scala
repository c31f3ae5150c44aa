package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.SimilarityQueries

/** `q_ann_append2` — RE-ENTRANT ANN index accretion (the round-19
  * re-entrancy law, ANN family): both dump waves encoded under the
  * frozen quantizers and appended in arrival order; the serve searches
  * the twice-appended store.
  *
  * Laws:
  *  1. RE-ENTRANCY — the twice-appended store's search equals the
  *     one-append search (q_ann_incremental) AND the from-scratch
  *     stored search (q_ann_ivfpq_stored), row for row.
  *  2. STORE ≡ REBUILD — the twice-appended table's (vec_id, cell)
  *     row set equals the from-scratch encode of the full corpus.
  *  3. THE MARK MOVED — thr < mid and both waves are non-empty.
  */
class AnnAppend2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("twice-appended search == one-append == from-scratch stored") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toSeq).toSeq
    val two = rows("q_ann_append2")
    assert(two.nonEmpty)
    assert(two == rows("q_ann_incremental"),
      "the twice-appended store's search diverged from the " +
        "one-append search")
    assert(two == rows("q_ann_ivfpq_stored"),
      "the twice-appended store's search diverged from the " +
        "from-scratch stored search")
  }

  test("store row set == from-scratch encode of the full corpus") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.get(1))).toSet
    val stored = key(SimilarityQueries.annStoreAppended2(spark, dir))
    val rebuilt = key(SimilarityQueries.annStore(spark, dir))
    assert(stored.nonEmpty)
    assert(stored == rebuilt,
      "the twice-appended index's (vec_id, cell) set diverged from " +
        "the from-scratch index — an append dropped, duplicated, or " +
        "mis-assigned rows")
    assert(stored.size ==
        Tables.embeddings(spark, dir).count(),
      "the index does not carry exactly one row per vector")
  }

  test("the mark advanced and both waves are non-empty") {
    val thr = SimilarityQueries.incVecThreshold(spark, dir)
    val mid = SimilarityQueries.incVecMid(spark, dir)
    assert(thr < mid, s"mark did not advance: thr=$thr mid=$mid")
    val e = Tables.embeddings(spark, dir)
    val nA = e.filter(col("vec_id") >= lit(thr)
      && col("vec_id") < lit(mid)).count()
    val nB = e.filter(col("vec_id") >= lit(mid)).count()
    assert(nA > 0, "wave A is empty — the first append is vacuous")
    assert(nB > 0, "wave B is empty — the second append is vacuous")
  }
}
