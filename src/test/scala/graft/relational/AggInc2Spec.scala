package graft.relational

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.RelationalQueries

/** `q_agg_inc2` — RE-ENTRANT MV maintenance (VERDICT r18 item 1): two
  * successive dump slices merged through a PERSISTED intermediate
  * store, with the high-water mark advancing between passes.
  *
  * Laws:
  *  1. RE-ENTRANCY — merge(merge(store, d1), d2) equals the one-step
  *     merge AND the full recompute, row for row (two-step ≡ one-step
  *     ≡ rebuild).
  *  2. THE MARK MOVED — thr < mid, and BOTH slices are non-empty (a
  *     degenerate split would make the second merge vacuous).
  *  3. STORE SEMANTICS — the intermediate store holds RAW partials
  *     whose counts equal the below-mid recompute exactly (rounding
  *     the store is the re-entrancy bug class), and it genuinely
  *     absorbed d1 (row counts moved vs the standing store).
  *  4. PLAN — the serve reads the v2 store table and pushes the
  *     advanced range predicate to the delta scan.
  */
class AggInc2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("two-step merge == one-step merge == full recompute") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toSeq).toSeq
    val two = rows("q_agg_inc2")
    assert(two.nonEmpty)
    assert(two == rows("q_agg_incremental"),
      "two-step maintenance diverged from the one-step merge")
    assert(two == rows("q_agg_lineitem"),
      "two-step maintenance diverged from full recompute")
  }

  test("the mark advanced and both slices are non-empty") {
    val thr = RelationalQueries.lineitemThreshold(spark, dir)
    val mid = RelationalQueries.lineitemMid(spark, dir)
    assert(thr < mid, s"mark did not advance: thr=$thr mid=$mid")
    val li = Tables.lineitem(spark, dir)
    val n1 = li.filter(col("l_orderkey") >= lit(thr)
      && col("l_orderkey") < lit(mid)).count()
    val n2 = li.filter(col("l_orderkey") >= lit(mid)).count()
    assert(n1 > 0, "slice d1 is empty — the first merge is vacuous")
    assert(n2 > 0, "slice d2 is empty — the second merge is vacuous")
  }

  test("store2 holds raw below-mid partials and absorbed d1") {
    val mid = RelationalQueries.lineitemMid(spark, dir)
    val store2 = RelationalQueries.aggStore2(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("p_n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val belowMid = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < lit(mid))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(store2 == belowMid,
      "the intermediate store's counts do not equal the below-mid " +
        "recompute — the first merge lost or duplicated partials")
    val store1 = RelationalQueries.aggStore(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("p_n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(store2.exists { case (k, n) => store1.get(k) != Some(n) },
      "store2 equals the standing store — d1 was never absorbed")
  }

  test("plan: serve reads the v2 store and pushes the advanced mark") {
    val df = SparkEntry.queries("q_agg_inc2")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_agg_store2_"),
      s"serve does not read the persisted v2 MV:\n${plan.take(2000)}")
    assert(plan.contains("GreaterThanOrEqual(l_orderkey"),
      s"the d2 range predicate was not pushed to the scan:\n" +
        plan.take(2000))
  }
}
