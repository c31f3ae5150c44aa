package graft.relational

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.RelationalQueries

/** `q_agg_incremental` — incremental materialized-view maintenance:
  * a persisted standing partial-agg table + a range-pruned delta agg,
  * merged at serve.
  *
  * Laws:
  *  1. MV LAW — the maintained serve equals full recomputation
  *     (q_agg_lineitem) row for row, both engine paths.
  *  2. TEETH — the delta is non-empty and genuinely moves at least one
  *     group's totals vs serving the store alone (a vacuous dump would
  *     make the merge untested).
  *  3. PLAN — the serve's lineitem scan pushes the order-key range
  *     filter to parquet (the standing corpus's bytes are never
  *     re-read) and the plan reads the persisted store table.
  */
class AggIncrementalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("maintained serve == full recompute, row for row") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toSeq).toSeq
    val inc = rows("q_agg_incremental")
    val full = rows("q_agg_lineitem")
    assert(inc.nonEmpty)
    assert(inc == full,
      s"incremental maintenance diverged from recompute:\n$inc\nvs\n$full")
  }

  test("the dump has teeth: delta non-empty, totals move") {
    val thr = RelationalQueries.lineitemThreshold(spark, dir)
    val nDelta = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") >= lit(thr)).count()
    assert(nDelta > 0, "empty delta — the merge path is vacuous")
    val storeOnly = RelationalQueries.aggStore(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("p_n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val served = SparkEntry.queries("q_agg_incremental")(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(served.exists { case (k, n) => storeOnly.get(k) != Some(n) },
      "no group's count moved — the dump touched nothing")
  }

  test("plan: delta scan pushes the range filter; store table read") {
    val df = SparkEntry.queries("q_agg_incremental")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_agg_store_"),
      s"serve does not read the persisted MV:\n${plan.take(2000)}")
    assert(plan.contains("GreaterThanOrEqual(l_orderkey"),
      s"the delta range predicate was not pushed to the scan:\n" +
        plan.take(2000))
  }
}
