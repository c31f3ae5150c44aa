package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.graphx.lib.{PageRank => GXPageRank}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** GraphX variant of [[PageRank]] — BASELINE.json:7 names GraphX the
  * intended approach; this is the scale path (edge-partitioned adjacency,
  * internal cache/unpersist per iteration, no Catalyst plan growth).
  *
  * Convention parity (SURVEY.md §7.5.2): the reference uses init 1/N,
  * teleport 0.15/N (/root/reference/src/PageRank/PageRank.java:259,316).
  * GraphX's UNnormalized static PageRank uses init 1.0, teleport
  * `resetProb`, update r' = resetProb + (1-resetProb)·Σ r/deg — exactly
  * N × the reference recurrence (it is linear), so dividing by N on the
  * way out reproduces reference ranks. We must call
  * `PageRank.runWithOptions(..., normalized = false)` directly: the
  * `staticPageRank` convenience method passes `normalized = true`
  * (SPARK-18847), which rescales the final rank sum to N — that would
  * *restore* the dangling mass the reference deliberately loses
  * (PageRank.java:305-316) and break parity. Dangling mass is lost in
  * both the reference and the unnormalized GraphX run.
  *
  * Vertex ids: GraphX needs Long ids. Hashing titles risks silent rank
  * merges on collision (~2.7% birthday bound at 1e9 pages on 64 bits),
  * so we assign collision-free ids with `monotonically_increasing_id`
  * (partition-offset ids — unique by construction at any scale) and
  * join them onto the edge list. The id column is nondeterministic
  * under RECOMPUTATION, so the id table is persisted and materialized
  * eagerly before any consumer reads it — after that every use sees the
  * same ids. (Round 4: this replaced an RDD `zipWithUniqueId`
  * round-trip, which needed the identical persist-first discipline but
  * paid two extra DataFrame⇄RDD conversions — 3.2 s → 2.4 s at sf0.1.)
  */
object PageRankGraphX {

  def run(pages: DataFrame, edges: DataFrame, iters: Int = PageRank.DefaultIters,
          resetProb: Double = PageRank.ResetProb): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._

    // Collision-free Long ids for every page (ADVICE r1: xxhash64 risked
    // silent merges; unique ids are exact at any scale). Materialized
    // NOW — see class doc.
    val ids = pages
      .select(col("page"), monotonically_increasing_id().as("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nIds = ids.count()

    val verts: RDD[(VertexId, String)] =
      ids.as[(String, Long)].rdd.map { case (p, i) => (i, p) }

    val sid = ids.select(col("page").as("src"), col("id").as("sid"))
    val did = ids.select(col("page").as("dst"), col("id").as("did"))
    val es: RDD[Edge[Int]] = edges
      .join(sid, "src").join(did, "dst")
      .select(col("sid"), col("did")).as[(Long, Long)]
      .rdd.map { case (s, d) => Edge(s, d, 1) }

    val g = Graph(verts, es, defaultVertexAttr = null.asInstanceOf[String])
    val n = nIds.toDouble // |V| already counted by the id materialization
    // normalized = false — see class doc; resetProb passed exactly (0.15),
    // not recomputed as 1 - 0.85 (fp: 0.15000000000000002).
    val ranked = GXPageRank.runWithOptions(
      g, numIter = iters, resetProb = resetProb, srcId = None,
      normalized = false).vertices

    val out = g.vertices.join(ranked)
      .map { case (_, (page, r)) => (page, r / n) }
      .toDF("page", "rank")
    ids.unpersist()
    out
  }
}
