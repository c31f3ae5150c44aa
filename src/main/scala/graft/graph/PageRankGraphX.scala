package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX variant of [[PageRank]] — BASELINE.json:7 names GraphX the
  * intended approach; this is the scale path (edge-partitioned adjacency,
  * internal cache/unpersist per iteration, no Catalyst plan growth).
  *
  * Convention parity (SURVEY.md §7.5.2): GraphX `staticPageRank` uses the
  * UNnormalized convention — init rank 1.0, teleport `resetProb` — while
  * the reference uses init 1/N, teleport 0.15/N
  * (/root/reference/src/PageRank/PageRank.java:259,316). The update is
  * linear, so GraphX ranks are exactly N × reference ranks; we divide by N
  * on the way out. Dangling mass is lost in both (neither redistributes).
  *
  * Vertex ids: GraphX needs Long ids; we key by xxhash64(page). Collision
  * odds at 1e9 pages ≈ 2.7e-2 birthday-bound on 64 bits — acceptable for
  * the alternate implementation; the DataFrame version is collision-free
  * and remains the source of truth for the oracle.
  */
object PageRankGraphX {

  def run(pages: DataFrame, edges: DataFrame, iters: Int = PageRank.DefaultIters,
          damping: Double = PageRank.Damping): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._

    val verts: RDD[(VertexId, String)] =
      pages.select(xxhash64(col("page")).as("id"), col("page"))
        .as[(Long, String)].rdd
    val es: RDD[Edge[Int]] =
      edges.select(xxhash64(col("src")), xxhash64(col("dst")))
        .as[(Long, Long)].rdd.map { case (s, d) => Edge(s, d, 1) }

    val g = Graph(verts, es, defaultVertexAttr = null.asInstanceOf[String])
    val n = g.vertices.count().toDouble
    val ranked = g.staticPageRank(iters, resetProb = 1 - damping).vertices

    val joined = g.vertices.join(ranked)
      .map { case (_, (page, r)) => (page, r / n) }
    joined.toDF("page", "rank")
  }
}
