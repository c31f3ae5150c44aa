package graft.relational

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.RelationalQueries

/** `q_agg_retract` — MV maintenance with the delete leg: negated
  * partials for the aged-out retention slice merged against the
  * standing store + the dump's delta.
  *
  * Laws:
  *  1. RETRACTION LAW — the maintained serve equals an engine-side
  *     full recompute over exactly the SURVIVING rows (l_orderkey ≥
  *     the retention cut), row for row.
  *  2. TEETH — the retracted slice is non-empty, strictly standing
  *     (below the high-water mark), and retraction genuinely moves at
  *     least one group's totals vs the append-only serve.
  *  3. PLAN — both maintenance scans push their range predicates (the
  *     delta's ≥ and the retraction's <); the store table is read.
  */
class AggRetractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("maintained serve == recompute over surviving rows") {
    val ret = RelationalQueries.retentionThreshold(spark, dir)
    val got = SparkEntry.queries("q_agg_retract")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val want = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") >= lit(ret))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got == want,
      s"retraction maintenance diverged from surviving-rows recompute:" +
        s"\n$got\nvs\n$want")
  }

  test("teeth: non-empty standing retraction that moves totals") {
    val ret = RelationalQueries.retentionThreshold(spark, dir)
    val thr = RelationalQueries.lineitemThreshold(spark, dir)
    assert(ret < thr, "the retention cut crossed the high-water mark " +
      "— the retracted slice would touch dump rows")
    val nRet = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < lit(ret)).count()
    assert(nRet > 0, "empty retraction slice — the delete leg is vacuous")
    def counts(q: String) = SparkEntry.queries(q)(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val appendOnly = counts("q_agg_incremental")
    val retracted = counts("q_agg_retract")
    assert(retracted.exists { case (k, n) => appendOnly.get(k) != Some(n) },
      "no group's count moved under retraction — the delete leg " +
        "changed nothing")
  }

  test("plan: both range predicates pushed; store table read") {
    val df = SparkEntry.queries("q_agg_retract")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_agg_store_"),
      s"serve does not read the persisted MV:\n${plan.take(2000)}")
    assert(plan.contains("GreaterThanOrEqual(l_orderkey"),
      s"the delta range predicate was not pushed:\n${plan.take(2000)}")
    assert(plan.contains("LessThan(l_orderkey"),
      s"the retraction range predicate was not pushed:\n${plan.take(2000)}")
  }
}
