package graft.graph

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.queries.GraphQueries

/** `q_graph_delete` — the graph family's takedown leg (VERDICT r18
  * item 6): tombstoned pages leave the standing graph (vertex +
  * incident edges) and the rank vector warm-starts over the survivor
  * set from the filtered standing store.
  *
  * Laws:
  *  1. NO TOMBSTONED PAGE — no served rank row names a tombstoned
  *     page, and every survivor IS served (the takedown removes
  *     exactly the tombstone set, nothing more).
  *  2. TEETH — the tombstone set is non-empty, incident edges were
  *     genuinely removed, and the re-run genuinely moved ranks vs the
  *     filtered standing seed (deleting a vertex changes neighbors'
  *     mass AND the teleport denominator).
  *  3. WARM-START LAW — the 4 warm iterations land closer to the
  *     survivor graph's fixed point than the seed was (the
  *     PageRankWarmSpec law, survivor-graph edition).
  */
class GraphDeleteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def tomb(p: String): Boolean =
    p.startsWith("s") && p.drop(1).toLong % 10 == 3

  test("no tombstoned page is served; every survivor is") {
    val served = SparkEntry.queries("q_graph_delete")(spark, dir)
      .select("page").collect().map(_.getString(0)).toSet
    val pages = GraphCatalog.tpch(spark, dir).pages
      .collect().map(_.getString(0)).toSet
    val tombstoned = pages.filter(tomb)
    assert(tombstoned.nonEmpty,
      "no page matches the takedown rule — every law here is vacuous")
    assert(served.intersect(tombstoned).isEmpty,
      "a taken-down page still has a served rank row")
    assert(served == pages -- tombstoned,
      "the served page set is not exactly the survivor set")
  }

  test("teeth: incident edges removed; the re-run moved ranks") {
    val thr = GraphCatalog.tpchOrderThreshold(spark, dir)
    val g = GraphCatalog.tpch(spark, dir)
    val standing = GraphCatalog.symmetrized(LinkGraph.removeRedLinks(
      LinkGraph.tpchEdges(spark, dir, maxOrder = Some(thr)), g.pages))
    val nAll = standing.count()
    val nSurv = standing.filter(
      !GraphQueries.graphTombstoned(col("src")) &&
        !GraphQueries.graphTombstoned(col("dst"))).count()
    assert(nSurv < nAll,
      "the takedown removed no edges — the tombstoned pages were " +
        "already isolated and the warm re-run is untested")
    val seed = GraphCatalog.tpchStandingRanks(spark, dir)
      .filter(!GraphQueries.graphTombstoned(col("page")))
      .select(col("page"), round(col("rank"), 6).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val served = SparkEntry.queries("q_graph_delete")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(served.keySet == seed.keySet)
    // both sides 6-dp rounded, so any difference is a real rank move
    assert(served.exists { case (p, r) =>
        math.abs(r - seed(p)) > 1e-7 },
      "the warm re-run left every rank unchanged — deletion did not " +
        "reach the recurrence")
  }

  test("warm-start law: 4 warm iterations land closer to the survivor " +
      "fixed point than the seed") {
    val thr = GraphCatalog.tpchOrderThreshold(spark, dir)
    val g = GraphCatalog.tpch(spark, dir)
    val survivorPages = g.pages
      .filter(!GraphQueries.graphTombstoned(col("page")))
    val survivorEdges = GraphCatalog.symmetrized(
      LinkGraph.removeRedLinks(
        LinkGraph.tpchEdges(spark, dir, maxOrder = Some(thr)), g.pages))
      .filter(!GraphQueries.graphTombstoned(col("src")) &&
        !GraphQueries.graphTombstoned(col("dst")))
    def vec(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // proxy fixed point: a deep cold run on the survivor graph —
    // chained as two 8-iteration runs (one 16-iteration plan OOMs the
    // test JVM's plan stringification; the chain truncates lineage)
    val fix8 = PageRank.run(survivorPages, survivorEdges, iters = 8)
    val fix = vec(PageRank.run(survivorPages, survivorEdges, iters = 8,
      initRanks = Some(fix8)))
    val seed = vec(GraphCatalog.tpchStandingRanks(spark, dir)
      .filter(!GraphQueries.graphTombstoned(col("page"))))
    val warm = vec(SparkEntry.queries("q_graph_delete")(spark, dir))
    def dist(v: Map[String, Double]) =
      fix.map { case (p, r) => math.abs(v.getOrElse(p, 0.0) - r) }.sum
    val (dSeed, dWarm) = (dist(seed), dist(warm))
    info(f"seed distance $dSeed%.6f -> warm distance $dWarm%.6f")
    assert(dWarm < dSeed,
      "the warm re-run did not approach the survivor fixed point — " +
        "the seed or the survivor graph is wrong")
  }
}
