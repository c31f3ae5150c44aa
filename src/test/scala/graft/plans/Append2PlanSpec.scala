package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{DedupQueries, MultimodalQueries, SimilarityQueries}

/** Plan shape of the round-19 twice-appended / versioned stores: a
  * bucketed APPEND must not cost a store its co-location or pruning
  * contract — correctness was gated, THIS pins the scale story.
  *
  *  1. q_dedup_append2's probe: exactly one file scan (the twice-
  *     appended store), bucketed, zero exchanges on the store side,
  *     no sketch re-planned at query time.
  *  2. q_mm_phash_inc2's probe: the appended store's scan crosses no
  *     exchange.
  *  3. q_ann_append2's serve: the twice-appended index still BUCKET-
  *     PRUNES (SelectedBucketsCount present and partial) — appends
  *     must not degrade the probed-cells read to a full index scan.
  *  4. Every round-19 persisted store keeps its bucket spec in the
  *     catalog (the store-hygiene law, applied to the new tables).
  */
class Append2PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def h = org.apache.commons.codec.digest.DigestUtils
    .md5Hex(dir).take(8)

  test("q_dedup_append2's probe: the twice-appended store scan is " +
      "bucketed and crosses no exchange (the MmPhashIncSpec string " +
      "pin — the store renders as the join's LAST subtree)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val mid = DedupQueries.incMidpoint(spark, dir)
      val nb = DedupQueries.bandedSigs(graft.Tables.documents(spark, dir)
        .filter(col("source") === DedupQueries.IncNewSource
          && col("doc_id") > lit(mid)))
      val store = DedupQueries.sigStoreAppended2(spark, dir)
      val plan = nb.as("x").join(store.as("y"),
          col("x.band") === col("y.band") &&
            col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") =!= col("y.doc_id"))
        .queryExecution.executedPlan.toString
      val storeToEnd = plan.linesIterator
        .dropWhile(l => !l.contains("graft_sig_app2_")).toSeq
      assert(storeToEnd.nonEmpty, s"store scan missing:\n$plan")
      assert(storeToEnd.head.contains("Bucketed: true")
          || plan.contains("Bucketed: true"),
        s"the twice-appended store scan is not bucketed:\n$plan")
      assert(!storeToEnd.exists(_.contains("Exchange hashpartitioning")),
        s"the twice-appended store shuffled:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q_mm_phash_inc2's probe: the twice-appended pHash store's " +
      "scan crosses no exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dump = graft.multimodal.Multimodal.assets(spark, dir)
        .filter(col("meta.origin") === DedupQueries.IncNewSource)
      val nb = MultimodalQueries.tier2Rows(
        graft.multimodal.Multimodal.aHashBands(dump, 32))
      val store = MultimodalQueries.phashStoreAppended2(spark, dir)
      val key = Seq("band", "bkey", "blk", "bval")
      val plan = nb.as("x").join(store.as("y"),
          key.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
            col("x.doc_id") =!= col("y.doc_id"))
        .queryExecution.executedPlan.toString
      val storeToEnd = plan.linesIterator
        .dropWhile(l => !l.contains("graft_phash_app2_")).toSeq
      assert(storeToEnd.nonEmpty, s"store scan missing:\n$plan")
      assert(!storeToEnd.exists(_.contains("Exchange hashpartitioning")),
        s"the twice-appended pHash store shuffled:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q_ann_append2: the twice-appended index still bucket-prunes") {
    val df = graft.SparkEntry.queries("q_ann_append2")(spark, dir)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
    val hits = sel.findAllMatchIn(s)
      .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    assert(hits.nonEmpty,
      s"no bucket pruning on the appended index scan:\n${s.take(2000)}")
    assert(hits.exists { case (k, n) => k < n },
      s"the appended index reads EVERY bucket ($hits) — pruning " +
        s"degraded to a full index scan:\n${s.take(2000)}")
  }

  test("every round-19 persisted store keeps its bucket spec") {
    def spec(tbl: String) = spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).bucketSpec
    // force the builds so the tables exist in this session's catalog
    DedupQueries.sigStoreAppended2(spark, dir)
    MultimodalQueries.phashStoreAppended2(spark, dir)
    SimilarityQueries.annStoreAppended2(spark, dir)
    graft.queries.EventQueries.scdStore2(spark, dir)
    graft.graph.GraphCatalog.tpchStandingRanks2(spark, dir)
    val expect = Seq(
      (s"graft_sig_app2_$h", Seq("band", "bkey")),
      (s"graft_phash_app2_$h", Seq("band", "bkey")),
      (s"graft_ann_app2_$h", Seq("cell")),
      (s"graft_scd_store2_$h", Seq("user_id")),
      (s"graft_rank_store2_$h", Seq("page")))
    expect.foreach { case (tbl, cols) =>
      val sp = spec(tbl)
      assert(sp.nonEmpty && sp.get.numBuckets == 8 &&
          sp.get.bucketColumnNames == cols,
        s"$tbl lost its bucket spec: $sp")
    }
  }
}
