package graft.graph

import graft.SparkSpec

/** The catalog's memoization contract: one build per (session, dir) —
  * repeated calls return the SAME persisted instances (the engine
  * analogue of the reference's implicit HDFS reuse across its 13-job
  * DAG); the cached graph is internally consistent. */
class GraphCatalogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("tpch graph is built once per (session, dir) and reused by reference") {
    val a = GraphCatalog.tpch(spark, sf)
    val b = GraphCatalog.tpch(spark, sf)
    assert(a.pages eq b.pages)
    assert(a.edges eq b.edges)
    assert(a.n == b.n)
  }

  test("rank vectors are memoized per iteration count") {
    val r8a = GraphCatalog.tpchRanks(spark, sf)
    val r8b = GraphCatalog.tpchRanks(spark, sf)
    val r1 = GraphCatalog.tpchRanks(spark, sf, iters = 1)
    assert(r8a eq r8b)
    assert(!(r8a eq r1)) // different iteration counts are distinct entries
  }

  test("cached graph is internally consistent") {
    val g = GraphCatalog.tpch(spark, sf)
    assert(g.n == g.pages.count())
    // every edge destination is a real page (red links removed)
    val dangling = g.edges.join(g.pages,
      g.edges("dst") === g.pages("page"), "left_anti").count()
    assert(dangling == 0)
  }
}
