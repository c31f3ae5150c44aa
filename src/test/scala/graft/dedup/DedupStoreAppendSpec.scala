package graft.dedup

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.DedupQueries

/** `q_dedup_store_append` — the signature store's APPEND lifecycle
  * step (the dedup mirror of the ANN family's append gate). Laws:
  * append ≡ rebuild (probing the appended store equals probing a
  * fresh store built over standing ∪ wave A), the bucketed table
  * physically gained exactly wave A's rows with its bucket spec
  * intact, and the appended rows genuinely matter — the sf0.01
  * fixture holds a wave-B × wave-A near-dup pair that the UN-appended
  * standing store cannot produce. */
class DedupStoreAppendSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val served =
    SparkEntry.queries("q_dedup_store_append")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("append == rebuild: the appended store's probe equals probing " +
      "a from-scratch standing ∪ A signature frame, row for row") {
    val mid = DedupQueries.incMidpoint(spark, dir)
    val docs = Tables.documents(spark, dir)
    val fresh = DedupQueries.bandedSigs(docs.filter(
      col("source") =!= DedupQueries.IncNewSource ||
        col("doc_id") <= lit(mid)))
    val nb = DedupQueries.bandedSigs(docs.filter(
      col("source") === DedupQueries.IncNewSource &&
        col("doc_id") > lit(mid)))
    val cross = nb.as("x").join(fresh.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b"),
        graft.dedup.Dedup.jaccardSorted(col("x.hs"), col("y.hs")).as("j"))
    val within = nb.as("x").join(nb.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        graft.dedup.Dedup.jaccardSorted(col("x.hs"), col("y.hs")).as("j"))
    val rebuilt = cross.unionByName(within)
      .groupBy("a", "b").agg(max("j").as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served.nonEmpty)
    assert(served == rebuilt)
  }

  test("the store table physically gained exactly wave A's signature " +
      "rows, bucket spec intact") {
    val docs = Tables.documents(spark, dir)
    val mid = DedupQueries.incMidpoint(spark, dir)
    val standingN = DedupQueries.signatureStore(spark, dir).count()
    val appended = DedupQueries.sigStoreAppended(spark, dir)
    val waveAN = DedupQueries.bandedSigs(docs.filter(
      col("source") === DedupQueries.IncNewSource &&
        col("doc_id") <= lit(mid))).count()
    assert(waveAN > 0, "vacuous wave A")
    assert(appended.count() == standingN + waveAN)
    val spec = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        "graft_sig_app_" + org.apache.commons.codec.digest
          .DigestUtils.md5Hex(dir).take(8))).bucketSpec
    assert(spec.nonEmpty &&
      spec.get.bucketColumnNames == Seq("band", "bkey"),
      s"bucket spec lost across the append: $spec")
  }

  test("the appended rows genuinely matter: a wave-B doc near-dups a " +
      "wave-A doc — a pair the un-appended standing store cannot see") {
    val mid = DedupQueries.incMidpoint(spark, dir)
    val newIds = Tables.documents(spark, dir)
      .filter(col("source") === DedupQueries.IncNewSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ba = served.filter { case (a, b, _) =>
      newIds(a) && newIds(b) && a <= mid && b > mid
    }
    assert(ba.nonEmpty,
      "fixture lost its teeth: no wave-B × wave-A pair — the append " +
        "step is vacuous on this corpus")
  }

  test("the appended table still probes bucket-co-located: the store " +
      "side of the cross join crosses no exchange (an append that " +
      "broke the bucket layout would silently reintroduce the " +
      "standing-corpus shuffle)") {
    val mid = DedupQueries.incMidpoint(spark, dir)
    val store = DedupQueries.sigStoreAppended(spark, dir)
    val nb = DedupQueries.bandedSigs(
      Tables.documents(spark, dir).filter(
        col("source") === DedupQueries.IncNewSource &&
          col("doc_id") > lit(mid)))
    val plan = nb.as("x").join(store.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bkey") === col("y.bkey"))
      .queryExecution.executedPlan.toString
    // the store-side scan feeds the join directly; only the (small)
    // probe side may shuffle into the bucket layout
    val storeScanToJoin = plan.linesIterator
      .dropWhile(l => !l.contains("graft_sig_app_")).toSeq
    assert(storeScanToJoin.nonEmpty, s"store scan missing:\n$plan")
    assert(!storeScanToJoin.exists(_.contains("Exchange hashpartitioning")),
      s"the appended store's scan shuffled:\n$plan")
  }
}
