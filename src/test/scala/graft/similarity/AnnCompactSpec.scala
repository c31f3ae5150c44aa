package graft.similarity

import graft.{SparkEntry, SparkSpec}
import graft.queries.SimilarityQueries

/** `q_ann_compact` — physical compaction of the tombstoned store
  * (VERDICT r15 gap 2). The laws: the rewritten store physically lost
  * EXACTLY the tombstoned rows (surviving rows byte-identical, same
  * bucketing), and serving it answers row-for-row what the
  * tombstone-filtered store answers — compaction is observationally
  * equal to filtering under frozen quantizers. */
class AnnCompactSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("the compacted table physically lost exactly the tombstoned " +
      "rows; survivors are byte-identical to their standing form") {
    val store = SimilarityQueries.annStore(spark, dir)
    val compact = SimilarityQueries.annStoreCompacted(spark, dir)
    val nStore = store.count()
    val nDeleted = store.filter(SimilarityQueries.AnnDeleteRule).count()
    assert(nDeleted > 0, "vacuous tombstone set on this corpus")
    assert(compact.count() == nStore - nDeleted)
    assert(compact.filter(SimilarityQueries.AnnDeleteRule).count() == 0,
      "a tombstoned row survived compaction")
    // byte-identity: no re-encode happened — (vec_id, codes, cell)
    // rows of the compacted table are exactly the store's undeleted
    // rows (anti-joins empty both ways)
    val undeleted = store.filter(!SimilarityQueries.AnnDeleteRule)
    assert(compact.exceptAll(undeleted).isEmpty &&
      undeleted.exceptAll(compact).isEmpty,
      "compaction changed row contents — it must be a pure filter")
  }

  test("the compacted table keeps the store's cell bucketing (the " +
      "probe-time pruning contract)") {
    val cat = spark.sessionState.catalog
    val id = org.apache.spark.sql.catalyst.TableIdentifier(
      "graft_ann_compact_" + org.apache.commons.codec.digest
        .DigestUtils.md5Hex(dir).take(8))
    SimilarityQueries.annStoreCompacted(spark, dir).count() // ensure built
    val spec = cat.getTableMetadata(id).bucketSpec
    assert(spec.nonEmpty && spec.get.numBuckets == 8 &&
      spec.get.bucketColumnNames == Seq("cell"),
      s"bucket spec lost in the rewrite: $spec")
  }

  test("serving the compacted store == serving the tombstone-filtered " +
      "store, row for row") {
    val viaFilter =
      SparkEntry.queries("q_ann_delete")(spark, dir).collect().toSeq
    val viaCompact =
      SparkEntry.queries("q_ann_compact")(spark, dir).collect().toSeq
    assert(viaCompact.nonEmpty)
    assert(viaCompact == viaFilter)
  }
}
