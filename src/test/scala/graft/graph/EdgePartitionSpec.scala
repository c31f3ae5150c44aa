package graft.graph

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy}

import graft.SparkSpec

/** The GraphX path partitions edges with EdgePartition2D before the
  * iteration loop (VERDICT r5): a vertex's edges land in at most 2√P
  * partitions, so a hub vertex cannot concentrate its whole edge set in
  * one task the way src-hash placement would.
  */
class EdgePartitionSpec extends SparkSpec {

  test("EdgePartition2D bounds a hub vertex's per-partition edge count") {
    val sc = spark.sparkContext
    val nE = 10000
    // star graph: every edge shares src 0 — the worst hub shape
    val es = sc.parallelize((1 to nE).map(d => Edge(0L, d.toLong, 1)), 4)
    val verts = sc.parallelize((0 to nE).map(i => (i.toLong, ())), 4)
    val g = Graph(verts, es).partitionBy(PartitionStrategy.EdgePartition2D)
    val sizes = g.edges.mapPartitions(it => Iterator(it.size), true).collect()
    // src fixes the grid column, dst varies the row: the star spreads
    // over √P = 2 partitions (~nE/2 each); hash-by-src would put all
    // 10k edges in ONE partition
    assert(sizes.count(_ > 0) >= 2,
      s"hub edges not spread: ${sizes.toSeq}")
    assert(sizes.max <= nE / 2 + nE / 10,
      s"one partition holds ${sizes.max} of $nE hub edges")
  }
}
