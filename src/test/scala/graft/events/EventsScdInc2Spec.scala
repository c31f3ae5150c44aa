package graft.events

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.EventQueries

/** `q_events_scd_inc2` — RE-ENTRANT SCD2 maintenance (VERDICT r18
  * item 1, event family): two successive event dump slices merged
  * through a PERSISTED intermediate dimension store, the high-water
  * mark advancing between passes.
  *
  * Laws:
  *  1. RE-ENTRANCY — merge(merge(store, d1), d2) equals the one-step
  *     merge AND the full-log rebuild, row for row.
  *  2. THE MARK MOVED — mark < mid, both slices non-empty.
  *  3. STORE SEMANTICS — the intermediate store equals the SCD2 build
  *     over all events below mid (the collapse law composes through
  *     the persisted state: store2 ≡ rebuild-below-mid), including
  *     version numbers chaining from the stored max.
  *  4. PLAN — the serve reads the v2 store table.
  */
class EventsScdInc2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("two-step merge == one-step merge == full-log rebuild") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toSeq).toSeq
    val two = rows("q_events_scd_inc2")
    assert(two.nonEmpty)
    assert(two == rows("q_events_scd_inc"),
      "two-step maintenance diverged from the one-step merge")
    assert(two == rows("q_events_scd"),
      "two-step maintenance diverged from the full-log rebuild")
  }

  test("the mark advanced and both slices are non-empty") {
    val mark = EventQueries.eventsTsThreshold(spark, dir)
    val mid = EventQueries.eventsTsMid(spark, dir)
    assert(mark < mid, s"mark did not advance: mark=$mark mid=$mid")
    val ev = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us"))
    val n1 = ev.filter(col("us") >= mark && col("us") < mid).count()
    val n2 = ev.filter(col("us") >= mid).count()
    assert(n1 > 0, "slice d1 is empty — the first merge is vacuous")
    assert(n2 > 0, "slice d2 is empty — the second merge is vacuous")
  }

  test("store2 == the SCD2 build over events below mid") {
    val mid = EventQueries.eventsTsMid(spark, dir)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("valid_from_ts"), col("valid_to_ts"), col("version"))
      .collect().map(_.toSeq).toSet
    val store2 = key(EventQueries.scdStore2(spark, dir))
    val rebuilt = key(EventQueries.scdOf(Tables.events(spark, dir)
      .filter(col("ts") < timestamp_micros(lit(mid)))))
    assert(store2.nonEmpty)
    assert(store2 == rebuilt,
      "the intermediate dimension store diverged from the below-mid " +
        "rebuild — the merged state is not re-entrant")
    // and it genuinely moved vs the standing store: d1 added versions
    val store1Rows = EventQueries.scdStore(spark, dir).count()
    assert(EventQueries.scdStore2(spark, dir).count() > store1Rows,
      "store2 gained no versions over the standing store — d1 was " +
        "never absorbed")
  }

  test("plan: serve reads the v2 dimension store") {
    val df = SparkEntry.queries("q_events_scd_inc2")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_scd_store2_"),
      s"serve does not read the persisted v2 dimension:\n" +
        plan.take(2000))
  }
}
