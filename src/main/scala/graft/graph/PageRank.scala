package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank with the reference's exact conventions
  * (/root/reference/src/PageRank/PageRank.java):
  *   - init rank       = 1/N                    (PageRank.java:259)
  *   - teleport        = 0.15/N                 (PageRank.java:316)
  *   - damping         = 0.85                   (PageRank.java:305)
  *   - iterations      = 8, fixed               (PageRank.java:473)
  *   - dangling mass   = LOST, never redistributed (PageRank.java:305-316;
  *     total rank decays each iteration — replicated deliberately, see
  *     SURVEY.md §7.5.3)
  *   - a page with no in-links still gets 0.15/N (the reference's `$%$`
  *     self-record keeps it a reduce key, PageRank.java:281,317-319).
  *
  * Spark-first design: each iteration is
  *   contributions (explode-free: join ranks⋈edges⋈degrees)
  *   → groupBy(dst).sum     — one shuffle on dst, with map-side partial agg
  *   → left join back onto the vertex set — second shuffle (or broadcast)
  * and the loop truncates lineage with localCheckpoint so Catalyst never
  * re-optimizes an 8-deep accumulated plan (SURVEY.md §4.2 "iterative loop
  * lineage"). The reference spent 8 full HDFS text write+read round-trips
  * here (PageRank.java:543-564); we keep everything in memory.
  *
  * Scale notes (100 TB / 1000 executors): ranks and edges both shuffle on
  * their join keys; AQE handles skewed high-in-degree vertices
  * (skew-join split). For a production run, pre-partition `edges` by src
  * AND a copy by dst (or use GraphX's edge-partitioned representation,
  * see [[PageRankGraphX]]) so each iteration reuses the exchange instead
  * of re-shuffling — locally AQE + exchange reuse already picks this up.
  */
object PageRank {

  val Damping = 0.85
  val DefaultIters = 8

  /** @param pages DataFrame["page"]; @param edges DataFrame["src","dst"]
    * (already red-link-cleaned and deduped — use [[LinkGraph.removeRedLinks]]).
    * @return DataFrame["page", "rank"] — one row per page.
    */
  def run(pages: DataFrame, edges: DataFrame, iters: Int = DefaultIters,
          damping: Double = Damping): DataFrame = {
    val spark = pages.sparkSession

    val p = pages.persist(StorageLevel.MEMORY_AND_DISK)
    val n = p.count().toDouble // A2 — the reference's NVALUE counter

    // out-degree per source; rank_contribution(edge) = rank(src)/deg(src).
    // Precomputed once, reused all 8 iterations (the reference recomputed
    // it from the adjacency line every iteration, PageRank.java:265).
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    val edgesWithDeg = edges.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    edgesWithDeg.count() // materialize once

    var ranks = p.select(col("page"), (lit(1.0) / lit(n)).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = edgesWithDeg
        .join(ranks, edgesWithDeg("src") === ranks("page"))
        .select(col("dst"), (col("rank") / col("deg")).as("contrib"))
      val sums = contribs.groupBy("dst").agg(sum("contrib").as("mass"))
      ranks = p.join(sums, p("page") === sums("dst"), "left")
        .select(p("page"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("mass"), lit(0.0))).as("rank"))
        .localCheckpoint(eager = true) // truncate lineage per iteration
    }
    edgesWithDeg.unpersist()
    p.unpersist()
    ranks
  }

  /** F1 + O1 + M2: the reference's final ordering job — keep pages with
    * rank > 5/N, globally sorted descending (PageRank.java:328-388,
    * threshold at 336/346, FlipComparator sort at 399-419/578).
    * Spark: one range-partitioned total sort, no key-flip idiom needed.
    */
  def topRanks(ranks: DataFrame, n: Long): DataFrame =
    ranks.filter(col("rank") > lit(5.0) / lit(n.toDouble))
      .orderBy(col("rank").desc, col("page"))
      .select(col("page"), col("rank"))
}
