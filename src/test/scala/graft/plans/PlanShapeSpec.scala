package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
  BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec,
  SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan regression guards for the expensive non-ANN bench
  * families (VERDICT r9 item 4; AnnPlanShapeSpec is the model). The
  * scale arguments in SURVEY §9 rest on plan SHAPES — one shuffle per
  * PageRank iteration, agg+join (never a window) for substring dedup,
  * a bucket equi-join (never all-pairs) for LSH — and PLANS.md is a
  * regenerated artifact nobody diffs; a spec fails loudly.
  *
  * All assertions are STRUCTURAL over `queryExecution.executedPlan`
  * with AQE pinned OFF for the test: `sparkPlan` is the planner output
  * BEFORE EnsureRequirements, so it never contains shuffle exchanges
  * (counting them there is vacuously 0), while the non-adaptive
  * executedPlan is the fully-prepared tree with real
  * ShuffleExchangeExec nodes — and preparing it does not execute it.
  * Cached inputs appear as InMemoryTableScan leaves whose build plans
  * are not children, so counts cover exactly the work the query itself
  * adds. Nothing here executes a plan except the PageRank loops (whose
  * mid-loop truncation is eager by design).
  */
class PlanShapeSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"

  /** AQE off → executedPlan is the static prepared plan (no
    * AdaptiveSparkPlanExec wrapper hiding the tree from collect);
    * broadcast threshold pinned so a session-default tweak elsewhere
    * can't flip a join strategy under the assertions (same rationale
    * as AnnPlanShapeSpec's pinning, ADVICE r9). */
  private def withStaticPlans[A](body: => A): A = {
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def count(p: SparkPlan)(pf: PartialFunction[SparkPlan, Unit]): Int =
    p.collect { case n if pf.isDefinedAt(n) => 1 }.sum

  private def shuffles(p: SparkPlan): Int =
    count(p) { case _: ShuffleExchangeExec => () }
  private def equiJoins(p: SparkPlan): Int = count(p) {
    case _: SortMergeJoinExec | _: ShuffledHashJoinExec |
         _: BroadcastHashJoinExec => ()
  }

  private def assertNoAllPairs(name: String, p: SparkPlan): Unit = {
    assert(count(p) { case _: CartesianProductExec => () } == 0,
      s"$name: a join degenerated to a cartesian product:\n${p.toString.take(2000)}")
    assert(count(p) { case _: BroadcastNestedLoopJoinExec => () } == 0,
      s"$name: a join degenerated to a nested-loop join:\n${p.toString.take(2000)}")
  }

  test("q_pagerank iteration plan: 1 shuffle, broadcast rank join, no SMJ") {
    withStaticPlans {
    val g = graft.graph.GraphCatalog.tpch(spark, Dir)
    val plans = scala.collection.mutable.ArrayBuffer.empty[(Int, SparkPlan)]
    graft.graph.PageRank.run(g.pages, g.edges, iters = 2,
      onIterationPlan = (i, df) => plans += ((i, df.queryExecution.executedPlan)))
    assert(plans.size == 2)
    for ((i, p) <- plans) {
      // contributions join + keep-alive union + groupBy(dst): the agg's
      // exchange is the ONLY shuffle — the rank vector rides a broadcast
      assert(shuffles(p) == 1,
        s"iteration $i: expected exactly 1 shuffle (the contribution agg), " +
          s"got ${shuffles(p)}:\n${p.toString.take(2000)}")
      assert(count(p) { case _: SortMergeJoinExec => () } == 0,
        s"iteration $i: the rank join stopped broadcasting:\n${p.toString.take(2000)}")
      assert(count(p) { case _: BroadcastHashJoinExec => () } >= 1,
        s"iteration $i: no broadcast-hash contribution join:\n${p.toString.take(2000)}")
      assertNoAllPairs(s"q_pagerank iteration $i", p)
    }
    }
  }

  test("q_pagerank_redistributed iteration plan: 2 shuffles (agg + 1-row " +
      "dangling mass), broadcast-only joins") {
    withStaticPlans {
    val g = graft.graph.GraphCatalog.tpch(spark, Dir)
    val plans = scala.collection.mutable.ArrayBuffer.empty[(Int, SparkPlan)]
    graft.graph.PageRank.run(g.pages, g.edges, iters = 2,
      redistributeDangling = true,
      onIterationPlan = (i, df) => plans += ((i, df.queryExecution.executedPlan)))
    assert(plans.size == 2)
    for ((i, p) <- plans) {
      // shuffle 1: the contribution agg; shuffle 2: the single-partition
      // exchange under the global sum(rank·dang) aggregate. More means a
      // rank-vector shuffle crept in; fewer means the dangling mass
      // stopped being computed per iteration.
      assert(shuffles(p) == 2,
        s"iteration $i: expected 2 shuffles (contribution agg + dmass " +
          s"global agg), got ${shuffles(p)}:\n${p.toString.take(2000)}")
      assert(count(p) { case _: SortMergeJoinExec => () } == 0,
        s"iteration $i: a join stopped broadcasting:\n${p.toString.take(2000)}")
      assert(count(p) { case _: CartesianProductExec => () } == 0,
        s"iteration $i: non-broadcast cartesian product:\n${p.toString.take(2000)}")
      // the 1-row dmass cross join IS a broadcast nested-loop join — that
      // one is the intended shape; assert it broadcasts (is the only NLJ)
      assert(count(p) { case _: BroadcastNestedLoopJoinExec => () } <= 1,
        s"iteration $i: more than the one 1-row dmass cross join:\n" +
          p.toString.take(2000))
    }
    }
  }

  test("q_dedup_substring plan: agg+join form — no window function, " +
      "no all-pairs join") {
    // materialize = false: the lazy plan, for inspection only
    val p = graft.queries.DedupQueries
      .substringDupStats(graft.Tables.documents(spark, Dir),
        materialize = false)
      .queryExecution.sparkPlan
    // the hot-digest skew argument (SURVEY §9): corpus totals per digest
    // are a partial+final AGG joined back, never a window over the digest
    // partition (a hot digest would serialize through one window task)
    assert(count(p) { case _: WindowExec => () } == 0,
      s"q_dedup_substring: window form crept back in:\n${p.toString.take(2000)}")
    assert(equiJoins(p) >= 1,
      s"q_dedup_substring: totals join missing:\n${p.toString.take(2000)}")
    assertNoAllPairs("q_dedup_substring", p)
  }

  test("q_dedup_lsh plan: banded bucket equi-join — never all-pairs") {
    val p = graft.queries.DedupQueries.lshPairs(spark, Dir,
      materialize = false).queryExecution.sparkPlan
    // the candidate generator must be an equi-join on (band, bkey) —
    // CartesianProduct/nested-loop here means the O(n²) all-pairs
    // comparison the banding exists to avoid
    assert(equiJoins(p) >= 1,
      s"q_dedup_lsh: bucket equi-join missing:\n${p.toString.take(2000)}")
    assertNoAllPairs("q_dedup_lsh", p)
  }
}
