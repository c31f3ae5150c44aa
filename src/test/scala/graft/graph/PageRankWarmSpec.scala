package graft.graph

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** `q_pagerank_incremental` — warm-start maintenance over an appended
  * edge set: the standing rank store seeds fewer iterations on the
  * full graph.
  *
  * Laws:
  *  1. THE APPEND HAS TEETH — the dump adds edges (standing ⊂ full,
  *     both non-empty), so the warm re-run answers a genuinely changed
  *     graph.
  *  2. WARM START PAYS — L1(warm@4, reference) < L1(cold@4, reference)
  *     where the reference is a deep cold run (16 iterations) on the
  *     appended graph: the standing seed buys more accuracy than the
  *     halved budget costs. Also pinned: warm@4 lands closer than even
  *     cold@8 (the full default budget), the strong form of "the store
  *     is worth keeping".
  *  3. SEED LAW — at zero warm iterations the gate's input vector IS
  *     the standing store (initRanks plumbing; a dropped/renamed page
  *     would silently reseed at no-rank).
  */
class PageRankWarmSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def ranksMap(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def l1(a: Map[String, Double], b: Map[String, Double]): Double =
    (a.keySet ++ b.keySet).iterator
      .map(k => math.abs(a.getOrElse(k, 0.0) - b.getOrElse(k, 0.0))).sum

  test("the dump genuinely appends edges") {
    val g = GraphCatalog.tpch(spark, dir)
    val thr = GraphCatalog.tpchOrderThreshold(spark, dir)
    val standing = LinkGraph.removeRedLinks(
      LinkGraph.tpchEdges(spark, dir, maxOrder = Some(thr)), g.pages)
    val nStanding = standing.count()
    val nFull = g.edges.count()
    assert(nStanding > 0, "empty standing edge set")
    assert(nFull > nStanding,
      s"the dump added no edges ($nStanding standing, $nFull full) — " +
        "the warm re-run would be a no-op on this corpus")
    // standing ⊆ full (append-only: an existing (c, s) pair can recur
    // in new orders but never disappear)
    assert(standing.exceptAll(g.edges).isEmpty)
  }

  test("warm@4 beats cold@4 AND cold@8 against a deep reference on " +
      "the appended graph") {
    val g = GraphCatalog.tpch(spark, dir)
    val sym = GraphCatalog.symmetrized(g.edges)
    def cold(iters: Int) = ranksMap(
      PageRank.run(g.pages, sym, iters)
        .select(col("page"), col("rank")))
    // 16 cold iterations as two chained 8-iteration runs (identical
    // recurrence; each run truncates its own lineage — one 16-deep
    // plan OOMs the test JVM's plan stringification)
    val reference = ranksMap(
      PageRank.run(g.pages, sym, 8,
        initRanks = Some(PageRank.run(g.pages, sym, 8)))
        .select(col("page"), col("rank")))
    val cold4 = cold(4)
    val cold8 = cold(8)
    val warm4 = ranksMap(
      PageRank.run(g.pages, sym,
        iters = graft.queries.GraphQueries.WarmIters,
        initRanks = Some(GraphCatalog.tpchStandingRanks(spark, dir)))
        .select(col("page"), col("rank")))
    val (dWarm, dCold4, dCold8) =
      (l1(warm4, reference), l1(cold4, reference), l1(cold8, reference))
    info(f"L1 to 16-iter reference: warm@4 = $dWarm%.3e, " +
      f"cold@4 = $dCold4%.3e, cold@8 = $dCold8%.3e")
    assert(dWarm < dCold4,
      f"warm start lost to cold at equal budget ($dWarm%.3e >= $dCold4%.3e)")
    assert(dWarm < dCold8,
      f"warm@4 lost to cold@8 ($dWarm%.3e >= $dCold8%.3e) — the " +
        "standing store is not worth keeping on this corpus")
  }

  test("the rank store is a durable catalog table: load ≡ a fresh " +
      "standing run, bucket spec intact") {
    val g = GraphCatalog.tpch(spark, dir)
    val thr = GraphCatalog.tpchOrderThreshold(spark, dir)
    val fresh = ranksMap(PageRank.run(g.pages,
      GraphCatalog.symmetrized(LinkGraph.removeRedLinks(
        LinkGraph.tpchEdges(spark, dir, maxOrder = Some(thr)), g.pages)))
      .select(col("page"), col("rank")))
    val stored = ranksMap(GraphCatalog.tpchStandingRanks(spark, dir)
      .select(col("page"), col("rank")))
    assert(stored == fresh,
      "the stored vector diverged from a fresh standing run")
    val id = org.apache.spark.sql.catalyst.TableIdentifier(
      "graft_rank_store_" + org.apache.commons.codec.digest
        .DigestUtils.md5Hex(dir).take(8))
    val spec = spark.sessionState.catalog.getTableMetadata(id).bucketSpec
    assert(spec.nonEmpty && spec.get.numBuckets == 8 &&
      spec.get.bucketColumnNames == Seq("page"),
      s"rank store bucket spec lost: $spec")
  }

  test("seed law: zero warm iterations returns the standing store") {
    val g = GraphCatalog.tpch(spark, dir)
    val standing = GraphCatalog.tpchStandingRanks(spark, dir)
    val seeded = PageRank.run(g.pages, GraphCatalog.symmetrized(g.edges),
      iters = 0, initRanks = Some(standing))
    assert(ranksMap(seeded.select(col("page"), col("rank"))) ==
      ranksMap(standing.select(col("page"), col("rank"))))
  }
}
