package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round minimum-label propagation — the deterministic,
  * oracle-checkable form of connected components (HashMin algorithm).
  *
  * Each round every vertex takes the min of its own label and its
  * neighbors' labels (undirected view of the edge set); after k rounds
  * every vertex holds the min page-id within distance k — full
  * components once k ≥ diameter. A fixed k keeps the computation
  * bit-deterministic so DuckDB can replay it as chained CTEs (the same
  * trick as the PageRank oracle); production runs loop until a round
  * changes nothing (the label count converges) with the same body.
  *
  * Scale shape: per round one join of the label vector against the edge
  * list + a min-aggregation — the cost profile of a PageRank iteration
  * times two, structurally: the undirected view probes 2·|E| edge rows
  * (both directions) and the aggregation shuffles (string, string) label
  * pairs instead of (string, double). Profiled at sf0.1 (round 4):
  * ~0.85 s/round warm at local[32], and lazy-vs-eager checkpointing and
  * broadcast-vs-shuffle join variants are all within noise of each other
  * — the round-3 "broadcast materialization cascade" hypothesis did not
  * reproduce. Lineage truncated per round. The label vector is broadcast
  * only while |V| ≤ [[PageRank.BroadcastVertexLimit]] (same gate as the
  * PageRank rank vector — a full-vertex broadcast would OOM at 100 TB,
  * ADVICE r2 item 4); above it the join shuffles and AQE handles skew.
  */
object Components {

  /** Persist the doubled edge view only when the input edge set is NOT
    * already cached: the union is a narrow, cheap derivation, so when
    * `edges` sits in the block store (GraphCatalog), re-deriving it per
    * round is faster than materializing a second 2·|E| copy — measured
    * at sf0.1: 2.3 s vs 2.7 s for 3 rounds, with far less run-to-run
    * jitter (block-store churn). When `edges` comes straight off
    * parquet, persisting avoids `rounds` extra scans — that is the
    * 100 TB path. */
  private def undirectedView(edges: DataFrame): (DataFrame, Boolean) = {
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    val sourceCached =
      edges.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    if (sourceCached) (und, false)
    else (und.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      true)
  }

  /** @return DataFrame["page", "comp"] — comp = min label within
    *         `rounds` hops (component representative once converged). */
  def labelPropagation(pages: DataFrame, edges: DataFrame,
                       rounds: Int,
                       knownVertexCount: Option[Long] = None): DataFrame = {
    val (undirected, ownPin) = undirectedView(edges)

    // callers that already hold |V| (GraphCatalog) skip the count job
    val hintSmall = knownVertexCount.getOrElse(pages.count()) <=
      PageRank.broadcastVertexLimit(pages.sparkSession)
    def vhint(df: DataFrame): DataFrame = if (hintSmall) broadcast(df) else df

    var labels = pages.select(col("page"), col("page").as("lbl"))
    for (i <- 1 to rounds) {
      val neighbor = undirected
        .join(vhint(labels), undirected("dst") === labels("page"))
        .select(undirected("src").as("page"), col("lbl"))
      // lazy truncation per round, one eager materialization at the end
      // (same pattern and rationale as the PageRank loop)
      labels = neighbor.unionAll(labels)
        .groupBy("page").agg(min("lbl").as("lbl"))
        .localCheckpoint(eager = i == rounds)
    }
    if (ownPin) undirected.unpersist()
    labels.select(col("page"), col("lbl").as("comp"))
  }

  /** HashMin to convergence: iterate [[labelPropagation]] rounds until a
    * round changes no label (or `maxRounds` as a runaway guard). The
    * convergence check is an anti-join count of changed (page, lbl)
    * pairs — labels only ever decrease, so "no change" is a fixpoint.
    * Rounds here are eager by necessity: the loop CONDITION reads the
    * data, so each round is an action (unlike the fixed-round PageRank
    * loop, which defers to one final materialization). Round count is
    * bounded by the graph diameter — small for real link graphs.
    */
  def components(pages: DataFrame, edges: DataFrame,
                 maxRounds: Int = 50,
                 knownVertexCount: Option[Long] = None): DataFrame = {
    val (undirected, ownPin) = undirectedView(edges)

    val hintSmall = knownVertexCount.getOrElse(pages.count()) <=
      PageRank.broadcastVertexLimit(pages.sparkSession)
    def vhint(df: DataFrame): DataFrame = if (hintSmall) broadcast(df) else df

    var labels = pages.select(col("page"), col("page").as("lbl"))
      .localCheckpoint(eager = true)
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val neighbor = undirected
        .join(vhint(labels), undirected("dst") === labels("page"))
        .select(undirected("src").as("page"), col("lbl"))
      val next = neighbor.unionAll(labels)
        .groupBy("page").agg(min("lbl").as("lbl"))
        .localCheckpoint(eager = true)
      changed = next.join(labels,
        next("page") === labels("page") && next("lbl") === labels("lbl"),
        "left_anti").count()
      labels.unpersist(blocking = false)
      labels = next
      round += 1
    }
    if (ownPin) undirected.unpersist()
    labels.select(col("page"), col("lbl").as("comp"))
  }
}
