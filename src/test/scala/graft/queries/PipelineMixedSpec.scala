package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.graph.{GraphCatalog, LinkGraph, PageRank}
import graft.multimodal.Multimodal

/** `q_pipeline_mixed` — one dump carrying appends AND a takedown list,
  * every family applying BOTH legs under one boundary, generation 3
  * publishing all six post-mixed stores in ONE append (VERDICT r19
  * gap 3). The gate's oracle pins the COUNTS; this spec pins the
  * CONTENTS and the protocol.
  *
  * Laws:
  *  1. ONE PUBLISH — generation 3 is committed with exactly the six
  *     mixed stores (deletes and appends became visible together).
  *  2. CONTENTS — each mixed store equals its from-scratch form:
  *     sketch/encode/merge over (standing − takedown) ∪ dump, per
  *     family's own proven rules.
  *  3. TEETH — every family's takedown set AND dump set are
  *     non-empty on this corpus (otherwise laws hold vacuously).
  *  4. NO RESURRECTION, NO LOSS — no tombstoned item survives in any
  *     mixed store; every dump item arrived.
  */
class PipelineMixedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def mixedGate() =
    SparkEntry.queries("q_pipeline_mixed")(spark, dir)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("one publish: generation 3 commits exactly the six mixed " +
      "stores, and the gate's store_rows are the pointer tables'") {
    mixedGate() // runs commitMixed
    assert(PipelineCommit.snapshot(spark, dir, 3L) ==
        PipelineCommit.familiesMixed(dir),
      "generation 3 does not point at the six mixed stores")
    val gate = mixedGate()
    PipelineCommit.familiesMixed(dir).foreach { case (f, t) =>
      assert(gate(f)._3 == spark.table(t).count(),
        s"family $f's gate store_rows diverges from its pointer table")
    }
  }

  test("teeth: every family's takedown AND dump are non-empty") {
    val gate = mixedGate()
    gate.foreach { case (f, (del, app, _)) =>
      assert(del > 0, s"family $f's takedown set is empty — the " +
        "delete leg is vacuous on this corpus")
      assert(app > 0, s"family $f's dump is empty — the append leg " +
        "is vacuous on this corpus")
    }
  }

  test("dedup contents: mixed store == sketch((standing − takedown) " +
      "∪ dump), no tombstoned doc survives, every dump doc arrived") {
    mixedGate()
    val store = DedupQueries.sigStoreMixed(spark, dir)
    val expected = DedupQueries.bandedSigs(
      Tables.documents(spark, dir).filter(
        col("source") === DedupQueries.IncNewSource ||
          col("doc_id") % 10 =!= 3))
    def keys(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "band", "bkey")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2)))
      .toSet
    assert(keys(store) == keys(expected),
      "the mixed signature store diverges from the from-scratch sketch")
    // NO RESURRECTION: standing tombstoned ids are gone
    val tombIds = Tables.documents(spark, dir)
      .filter(col("source") =!= DedupQueries.IncNewSource &&
        col("doc_id") % 10 === 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tombIds.nonEmpty)
    assert(store.select("doc_id").collect().map(_.getLong(0)).toSet
      .intersect(tombIds).isEmpty,
      "a tombstoned document survived the mixed pass")
  }

  test("ann contents: mixed store's vector set == (standing − " +
      "takedown) ∪ dump") {
    mixedGate()
    val vThr = SimilarityQueries.incVecThreshold(spark, dir)
    val got = SimilarityQueries.annStoreMixed(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= lit(vThr) || col("vec_id") % 10 =!= 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == want,
      "the mixed ANN store's vector universe is wrong")
  }

  test("scd contents: mixed store == rebuild over surviving users' " +
      "full log, row for row") {
    mixedGate()
    val got = EventQueries.scdStoreMixed(spark, dir)
      .orderBy("user_id", "version").collect()
    val want = EventQueries.scdOf(Tables.events(spark, dir)
        .filter(!EventQueries.ScdDeleteRule))
      .orderBy("user_id", "version").collect()
    assert(got.toSeq == want.toSeq,
      "mixed SCD merge diverged from the surviving-users rebuild")
  }

  test("graph contents: mixed rank store == a fresh warm run over " +
      "the survivor full graph, and no tombstoned page is served") {
    mixedGate()
    val store = GraphQueries.rankStoreMixed(spark, dir)
    val g = GraphCatalog.tpch(spark, dir)
    val tomb = GraphQueries.graphTombstoned _
    val survivorPages = g.pages.filter(!tomb(col("page")))
    val survivorFull = GraphCatalog.symmetrized(g.edges)
      .filter(!tomb(col("src")) && !tomb(col("dst")))
    val fresh = PageRank.run(survivorPages, survivorFull,
      iters = 4,
      initRanks = Some(GraphCatalog.tpchStandingRanks(spark, dir)
        .filter(!tomb(col("page")))))
    def rounded(df: org.apache.spark.sql.DataFrame) = df
      .select(col("page"), round(col("rank"), 6).as("r"))
      .orderBy("page").collect().toSeq
    assert(rounded(store) == rounded(fresh),
      "the persisted mixed rank vector diverges from a fresh warm run")
    assert(store.filter(tomb(col("page"))).count() == 0L,
      "a tombstoned page is served from the mixed rank store")
  }

  test("mv contents: mixed store's partials == recompute over the " +
      "surviving rows (retention applied, dump absorbed)") {
    mixedGate()
    val ret = RelationalQueries.retentionThreshold(spark, dir)
    val got = RelationalQueries.aggStoreMixed(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("p_qty"), 2).as("q"), col("p_n"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    val want = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") >= lit(ret))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("q"),
        count(lit(1)).as("p_n"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(got.toSeq == want.toSeq,
      "mixed MV partials diverge from the surviving-rows recompute")
  }
}
