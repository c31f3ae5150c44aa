package graft.plans

import org.apache.spark.sql.SparkSession

/** Scale-adaptive execution scope for the iterative graph/training
  * loops (round-20 optimization — guide §1.2 "the distributed
  * algorithm", §2.2/§2.4 partitioning).
  *
  * The loops (PageRank, HITS, components, BFS, SSSP, LPA, k-core, the
  * BPE merge trainer) run 8–50 micro-stages per invocation. When the
  * loop state is broadcast-small — the same regime in which the loops
  * already broadcast their vertex vector (`hintSmall`) — two fixed
  * session-level costs dominate their wall time, measured at
  * sf0.1/local[32]/shuffle=32 (tools/probe_loop_ab*.scala, in-JVM
  * alternating A/B so host drift cancels):
  *
  *   1. **AQE per-stage materialization.** Adaptive execution turns
  *      every exchange into its own sub-job with a scheduler barrier
  *      and a re-planning pass. q_pagerank_cold runs 38 jobs with AQE
  *      on vs 12 with it off — and inside the loop AQE has nothing
  *      left to decide: the join strategy is already hinted from the
  *      known vertex count, the only exchange is the contribution
  *      aggregation, and aggregation skew is not AQE-splittable
  *      anyway (skew handling applies to joins only).
  *   2. **Session-constant shuffle partitioning.** A loop over a
  *      broadcast-small state shuffles a few MB per round; 32-way
  *      partitions make every round 32 sub-100 ms tasks — pure
  *      scheduling floor (the BASELINE.md watch-item-1 shape). The
  *      partition count here is derived from the loop's OWN row count
  *      (≈64 MB targets at ~32 B/row), not from the local core count:
  *      a bigger dataset derives more partitions on the same config.
  *
  *   Probe medians (local[32], anchor shuffle=32; the PageRank rows
  *   take component 1 only — see `derivePartitions` below):
  *     q_pagerank_cold          6.76 s → 3.64 s (AQE off alone)
  *     q_pagerank_incremental   3.33 s → 2.87 s (AQE off alone)
  *     q_graph_components       2.51 s → 1.26 s (full scope)
  *     q_text_bpe_train         5.91 s → 4.87 s (full scope)
  *
  * Above [[DefaultSmallRows]] the scope is a no-op: the 100 TB regime
  * keeps the session's AQE (skew-join splitting, runtime coalescing)
  * and partitioning untouched, exactly as before this round. The
  * threshold and the bytes-per-partition target are runtime-settable
  * conf (below) so a deployment can retune or disable without a
  * rebuild — the [[graft.graph.PageRank.broadcastVertexLimit]]
  * pattern.
  *
  * Concurrency: the scope save/sets/restores session conf around the
  * loop's actions, so it assumes no concurrent PLANNING on the same
  * session mid-loop — the assumption the streaming gates already make
  * when they pin state-store partitions (EventQueries). Catalog
  * queries run loops sequentially.
  */
object LoopExec {

  /** Kill switch: `false` disables the scope entirely. */
  val EnabledKey = "spark.graft.loopExec.enabled"

  /** Loop-state row count at/below which the scope engages. Default
    * matches [[graft.graph.PageRank.BroadcastVertexLimit]] — the scope
    * engages exactly in the regime where the loops broadcast their
    * vertex state and the per-round shuffle is MBs. */
  val SmallRowsKey = "spark.graft.loopExec.smallRows"
  val DefaultSmallRows = 10_000_000L

  /** Rows per derived shuffle partition (≈64 MB at ~32 B/row — the
    * guide §2.2 100 MB–1 GB band's low end, sized for the loops' thin
    * (key, double/long) state rows). */
  val RowsPerPartitionKey = "spark.graft.loopExec.rowsPerPartition"
  val DefaultRowsPerPartition = 2_000_000L

  private def longConf(spark: SparkSession, key: String, dflt: Long): Long =
    spark.conf.getOption(key).flatMap(v => scala.util.Try(v.toLong).toOption)
      .getOrElse(dflt)

  /** Shuffle partitions derived from the loop's state size: never more
    * than the session setting (the scope only ever shrinks tiny-state
    * shuffles, it cannot starve a big one — big states skip the scope
    * entirely via [[SmallRowsKey]]). */
  def partitionsFor(spark: SparkSession, rows: Long): Int = {
    val perPart = math.max(1L,
      longConf(spark, RowsPerPartitionKey, DefaultRowsPerPartition))
    val derived = ((rows + perPart - 1) / perPart).max(1L)
    val session = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").trim.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    math.min(derived, math.max(session, 1).toLong).toInt
  }

  /** Narrow (shuffle-free) coalesce of a small loop-state frame to the
    * same size-derived partition count the scope's shuffles use — for
    * frames materialized BEFORE the scope engaged (e.g. a checkpoint
    * whose row count the scope's gate needed), whose session-width
    * block layout would otherwise put `session-partitions` map tasks
    * under every loop job. No-op above the threshold / when disabled /
    * when the frame already has no more partitions than derived.
    * ONLY for order-insensitive loop state (the `derivePartitions`
    * contract — coalesce reorders rows within partitions). */
  def coalesceSmall(df: org.apache.spark.sql.DataFrame, rows: Long)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val enabled = spark.conf.getOption(EnabledKey).forall(_ != "false")
    val small = rows >= 0 &&
      rows <= longConf(spark, SmallRowsKey, DefaultSmallRows)
    if (!enabled || !small) df
    else df.coalesce(partitionsFor(spark, rows))
  }

  /** Run `body` (the loop, INCLUDING its materializing actions) with
    * AQE off and — when `derivePartitions` — size-derived shuffle
    * partitions, iff `rows` — the loop's per-round state size, e.g.
    * the counted vertex set — is within [[SmallRowsKey]]. No-op above
    * the threshold, when disabled, or when `rows` is unknown
    * (negative).
    *
    * `derivePartitions` must be FALSE for loops whose aggregates SUM
    * DOUBLES (PageRank, HITS): changing the reduce partition count
    * reorders floating-point accumulation, and the graph family pins
    * bit-exact equalities across runs (the rank store's load ≡ a
    * fresh standing run, PageRankWarmSpec — measured divergence is
    * ~ulps, harmless to the 1e-6-rounded oracle gates but fatal to
    * the bit pin). Loops whose aggregates are order-insensitive —
    * integer sums/counts, MIN/MAX, label sets (components, BFS, SSSP,
    * LPA, k-core, star contraction, BPE pair counts) — are
    * partition-invariant by algebra and take the full scope. */
  def withSmallLoopExec[T](spark: SparkSession, rows: Long,
      derivePartitions: Boolean = true)(body: => T): T = {
    val enabled = spark.conf.getOption(EnabledKey).forall(_ != "false")
    val small = rows >= 0 &&
      rows <= longConf(spark, SmallRowsKey, DefaultSmallRows)
    if (!enabled || !small) body
    else {
      val aqeKey = "spark.sql.adaptive.enabled"
      val spKey = "spark.sql.shuffle.partitions"
      val savedAqe = spark.conf.getOption(aqeKey)
      val savedSp = spark.conf.getOption(spKey)
      try {
        spark.conf.set(aqeKey, "false")
        if (derivePartitions)
          spark.conf.set(spKey, partitionsFor(spark, rows).toString)
        body
      } finally {
        savedAqe.fold(spark.conf.unset(aqeKey))(spark.conf.set(aqeKey, _))
        savedSp.fold(spark.conf.unset(spKey))(spark.conf.set(spKey, _))
      }
    }
  }
}
