package graft.events

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.EventQueries

/** `q_events_scd_delete` — user erasure on the SCD2 dimension (the
  * forget leg completing the store lifecycle matrix).
  *
  * Laws:
  *  1. NO ERASED USER — no served version row names an erased user,
  *     and the served rows are EXACTLY the full dimension minus the
  *     erased users' rows (erasure is per-user total, touching
  *     nothing else).
  *  2. TEETH — the erased set is non-empty and genuinely removed
  *     versions.
  *  3. BOTH SIDES — erased users existed in the STORE and in the
  *     DELTA (a rule hitting only one side would leave half the
  *     erasure path untested).
  */
class EventsScdDeleteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("erased users vanish; everyone else is untouched") {
    val served = SparkEntry.queries("q_events_scd_delete")(spark, dir)
      .collect().map(_.toSeq).toSet
    val full = SparkEntry.queries("q_events_scd")(spark, dir)
      .collect().map(_.toSeq).toSet
    val expected = full.filterNot(r =>
      r.head.asInstanceOf[Long] % 10 == 3)
    assert(expected != full,
      "no dimension row matches the erasure rule — the gate is vacuous")
    assert(served == expected,
      "erasure did not remove exactly the erased users' version rows")
    assert(served.forall(r => r.head.asInstanceOf[Long] % 10 != 3),
      "an erased user still has a served version")
  }

  test("the rule hits both the store and the delta") {
    val mark = EventQueries.eventsTsThreshold(spark, dir)
    val erasedInStore = EventQueries.scdStore(spark, dir)
      .filter(EventQueries.ScdDeleteRule).count()
    val erasedInDelta = Tables.events(spark, dir)
      .filter(col("ts") >= timestamp_micros(lit(mark)))
      .filter(EventQueries.ScdDeleteRule).count()
    assert(erasedInStore > 0,
      "no erased user has standing versions — the store filter is " +
        "untested")
    assert(erasedInDelta > 0,
      "no erased user has dump events — the delta filter is untested")
  }
}
