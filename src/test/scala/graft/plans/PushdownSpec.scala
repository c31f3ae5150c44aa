package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Executable plan receipts — the properties PLANS.md documents as
  * prose, asserted so a regression (a filter that stops reaching the
  * scan, a projection that stops pruning) turns a build red instead of
  * silently bloating 100 TB scans.
  */
class PushdownSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect() // AQE-final plan only exists after an action
    df.queryExecution.executedPlan.toString
  }

  test("q_date_filter: the date predicate reaches the parquet scan") {
    val plan = executedPlan("q_date_filter")
    assert(plan.contains("PushedFilters: ["), plan.take(800))
    assert(!plan.contains("PushedFilters: []"), "filter NOT pushed down")
    assert(plan.contains("o_orderdate"), "pushed filter lost the column")
  }

  test("q_agg_lineitem: column pruning reaches the scan ReadSchema") {
    val plan = executedPlan("q_agg_lineitem")
    val schema = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no ReadSchema in plan"))
    // the query touches flag/status/qty/price-ish columns only — a
    // 16-column lineitem read here would be a pruning regression
    assert(!schema.contains("l_comment"), schema)
    assert(!schema.contains("l_shipinstruct"), schema)
  }

  test("q_agg_lineitem: aggregation is partial+final (map-side combine)") {
    val plan = executedPlan("q_agg_lineitem")
    assert(plan.contains("partial_"), "no partial aggregate in:\n" +
      plan.take(800))
  }

  test("whole-stage codegen covers the scan-side pipeline") {
    val plan = executedPlan("q_agg_lineitem")
    assert(plan.contains("*("), "no WholeStageCodegen spans")
  }
}
