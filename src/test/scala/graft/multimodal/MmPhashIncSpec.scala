package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.{DedupQueries, MultimodalQueries}

/** `q_mm_phash_inc` — incremental image dedup against the persisted
  * tier-2 pHash store.
  *
  * Laws:
  *  1. STORE/PROBE SPLIT IS INVISIBLE — the probe answers exactly the
  *     batch pair law restricted to pairs touching the dump (computed
  *     here from q_mm_phash's verified output + the source map).
  *  2. CROSS ROUTE HAS TEETH — at least one pair joins a dump asset to
  *     a STANDING asset, i.e. a pair only the store can supply (on
  *     this corpus every verified dump pair is cross; the within-dump
  *     route shares the identical join shape and is covered by law 1
  *     whenever the corpus produces one).
  *  3. STORE HYGIENE — the persisted table contains no dump rows and
  *     keeps the (band, bkey) bucket spec the co-located probe relies
  *     on.
  *  4. NO STANDING SHUFFLE — the store side of the probe join crosses
  *     no exchange (the signature-store contract: only the small dump
  *     shuffles into the bucket layout).
  */
class MmPhashIncSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def dumpIds: Set[Long] =
    Tables.documents(spark, dir)
      .filter(col("source") === DedupQueries.IncNewSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("probe == the batch pair law restricted to dump-touching pairs") {
    val nd = dumpIds
    val batch = SparkEntry.queries("q_mm_phash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => nd(a) || nd(b) }.toSet
    val inc = SparkEntry.queries("q_mm_phash_inc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc.nonEmpty, "no verified pair touches the dump — vacuous")
    assert(inc == batch,
      s"store/probe split changed answers: probe ${inc.size}, " +
        s"batch-restricted ${batch.size}")
  }

  test("the cross route fires: a dump asset near-dups a STANDING asset") {
    val nd = dumpIds
    val cross = SparkEntry.queries("q_mm_phash_inc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => nd(a) != nd(b) }
    assert(cross.nonEmpty,
      "no cross pair — the persisted store contributed nothing")
  }

  test("store hygiene: no dump rows; bucket spec intact") {
    val store = MultimodalQueries.phashStore(spark, dir)
    val nd = dumpIds
    val leaked = store.select("doc_id").distinct().collect()
      .map(_.getLong(0)).filter(nd)
    assert(leaked.isEmpty, s"dump assets leaked into the store: " +
      s"${leaked.take(5).mkString(",")}")
    val id = org.apache.spark.sql.catalyst.TableIdentifier(
      "graft_phash_store_" + org.apache.commons.codec.digest
        .DigestUtils.md5Hex(dir).take(8))
    val spec = spark.sessionState.catalog.getTableMetadata(id).bucketSpec
    assert(spec.nonEmpty && spec.get.numBuckets == 8 &&
      spec.get.bucketColumnNames == Seq("band", "bkey"),
      s"bucket spec lost: $spec")
  }

  test("the store side of the probe join crosses no exchange") {
    val dump = Multimodal.assets(spark, dir)
      .filter(col("meta.origin") === DedupQueries.IncNewSource)
    val nb = MultimodalQueries.tier2Rows(Multimodal.aHashBands(dump, 32))
    val store = MultimodalQueries.phashStore(spark, dir)
    val key = Seq("band", "bkey", "blk", "bval")
    val plan = nb.as("x").join(store.as("y"),
        key.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _))
      .queryExecution.executedPlan.toString
    val storeScanToJoin = plan.linesIterator
      .dropWhile(l => !l.contains("graft_phash_store_")).toSeq
    assert(storeScanToJoin.nonEmpty, s"store scan missing:\n$plan")
    assert(!storeScanToJoin.exists(_.contains("Exchange hashpartitioning")),
      s"the store's scan shuffled:\n$plan")
  }
}
