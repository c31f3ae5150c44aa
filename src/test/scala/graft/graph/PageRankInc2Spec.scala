package graft.graph

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** `q_pagerank_inc2` — the TWICE-warmed rank store (VERDICT r18
  * item 1, graph family): warm pass 1 over the mid graph persists its
  * vector as the v2 store; warm pass 2 over the full graph seeds from
  * THAT store.
  *
  * Laws:
  *  1. THE MARK MOVED — thr < mid < max and the three edge sets are
  *     strictly nested (standing ⊂ mid ⊂ full), so both warm passes
  *     see genuinely new edges.
  *  2. STORE CHAIN — the v2 store differs from the standing store (the
  *     first warm pass genuinely moved the vector) and the served
  *     vector differs from BOTH q_pagerank_incremental's (one warm
  *     pass off the standing store) and the v2 store itself (the
  *     second pass genuinely ran).
  *  3. PLAN — the serve's first iteration reads the v2 store table.
  *  (Hash equality against the 16-iteration three-chain oracle is the
  *  driver's job — the strongest statement of the composed law.)
  */
class PageRankInc2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("the mark advanced: standing ⊂ mid ⊂ full edge sets") {
    val thr = GraphCatalog.tpchOrderThreshold(spark, dir)
    val mid = GraphCatalog.tpchOrderMid(spark, dir)
    assert(thr < mid, s"mark did not advance: thr=$thr mid=$mid")
    val g = GraphCatalog.tpch(spark, dir)
    val nStand = LinkGraph.removeRedLinks(
      LinkGraph.tpchEdges(spark, dir, maxOrder = Some(thr)), g.pages)
      .count()
    val nMid = LinkGraph.removeRedLinks(
      LinkGraph.tpchEdges(spark, dir, maxOrder = Some(mid)), g.pages)
      .count()
    val nFull = g.edges.count()
    assert(nStand < nMid,
      s"slice d1 added no edges ($nStand -> $nMid) — warm pass 1 vacuous")
    assert(nMid < nFull,
      s"slice d2 added no edges ($nMid -> $nFull) — warm pass 2 vacuous")
  }

  test("the store chain genuinely moves at each pass") {
    def vec(df: org.apache.spark.sql.DataFrame) = df
      .select(col("page"), round(col("rank"), 6).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val store1 = vec(GraphCatalog.tpchStandingRanks(spark, dir))
    val store2 = vec(GraphCatalog.tpchStandingRanks2(spark, dir))
    assert(store2 != store1,
      "the v2 store equals the standing store — warm pass 1 never ran")
    val served = SparkEntry.queries("q_pagerank_inc2")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(served != store2,
      "the served vector equals the v2 store — warm pass 2 never ran")
    val oneStep = SparkEntry.queries("q_pagerank_incremental")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(served != oneStep,
      "twice-warmed equals once-warmed — the mid store was never in " +
        "the chain (seed read from the wrong side)")
  }

  test("plan: the serve reads the v2 rank store") {
    val df = SparkEntry.queries("q_pagerank_inc2")(spark, dir)
    df.collect()
    // the loop checkpoints per iteration, so the executed plan of the
    // RESULT no longer shows the seed scan; assert on the store
    // accessor's own plan instead (the table-backed read the first
    // iteration consumed)
    val seed = GraphCatalog.tpchStandingRanks2(spark, dir)
    seed.collect()
    val plan = seed.queryExecution.executedPlan.toString
    assert(plan.contains("graft_rank_store2_"),
      s"the v2 seed is not a table-backed read:\n${plan.take(2000)}")
  }
}
