package graft.dedup

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.DedupQueries

/** `q_dedup_incremental` — the persisted-store cross-dump shape — must
  * equal the FULL-corpus verified LSH pair list restricted to pairs
  * touching the new-dump slice: same sketch, same bands, same exact
  * Jaccard, so splitting the corpus into store + probe loses nothing
  * and invents nothing. Also pins gate non-vacuity on BOTH routes
  * (new-vs-standing and new-vs-new), since an incremental dedup that
  * only ever exercises one join path hides regressions in the other. */
class IncrementalDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("incremental pairs == full LSH pairs restricted to the new dump") {
    val inc = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val newIds = Tables.documents(spark, dir)
      .filter(col("source") === DedupQueries.IncNewSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val full = DedupQueries.lshPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => newIds.contains(p._1) || newIds.contains(p._2)).toSet
    assert(inc == full,
      s"incremental ${inc.size} pairs != restricted full ${full.size}")
    // non-vacuity, per route: the store join found cross-dump pairs AND
    // the dump self-join found within-dump pairs
    val cross = inc.count(p =>
      newIds.contains(p._1) ^ newIds.contains(p._2))
    val within = inc.count(p =>
      newIds.contains(p._1) && newIds.contains(p._2))
    assert(cross >= 1, "no new-vs-standing pair — the store route is untested")
    assert(within >= 1, "no within-dump pair — the self-join route is untested")
  }

  test("the signature store excludes the new dump and carries the sketch") {
    val store = DedupQueries.signatureStore(spark, dir)
    val newIds = Tables.documents(spark, dir)
      .filter(col("source") === DedupQueries.IncNewSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val storeIds = store.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(storeIds.intersect(newIds).isEmpty,
      "the new dump leaked into the standing store")
    assert(storeIds.nonEmpty)
    // 4 bands per document, hs present for exact verification
    assert(store.columns.toSet == Set("doc_id", "hs", "band", "bkey"))
    assert(store.count() == storeIds.size * 4L)
  }
}
