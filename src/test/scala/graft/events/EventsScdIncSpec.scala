package graft.events

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.EventQueries

/** `q_events_scd_inc` — incremental SCD2 maintenance: the standing
  * dimension store + the event dump merged without re-reading the
  * standing log.
  *
  * Laws:
  *  1. MERGE LAW — the maintained dimension equals the full rebuild
  *     (q_events_scd) row for row, both engine paths (the one-oracle
  *     law's engine-side statement).
  *  2. TEETH — the delta is non-empty; some stored OPEN version
  *     genuinely CLOSES under the dump, and some user gains NEW
  *     versions past the stored max (otherwise the maintenance never
  *     exercises either merge edge).
  *  3. PASS-THROUGH — every CLOSED store version appears in the
  *     merged output verbatim (the standing history is inherited,
  *     never recomputed).
  *  4. PLAN — the delta scan pushes the ts range predicate and the
  *     serve reads the persisted store table.
  */
class EventsScdIncSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("maintained dimension == full rebuild, row for row") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir)
      .collect().map(_.toSeq).toSeq
    val inc = rows("q_events_scd_inc")
    val full = rows("q_events_scd")
    assert(inc.nonEmpty)
    assert(inc == full,
      "incremental dimension maintenance diverged from the full rebuild")
  }

  test("teeth: non-empty delta; an open version closes; versions grow") {
    val thr = EventQueries.eventsTsThreshold(spark, dir)
    val nDelta = Tables.events(spark, dir)
      .filter(col("ts") >= timestamp_micros(lit(thr))).count()
    assert(nDelta > 0, "empty event dump — the merge path is vacuous")
    val store = EventQueries.scdStore(spark, dir)
    val openVf = store.filter(col("valid_to_ts").isNull)
      .select("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val merged = SparkEntry.queries("q_events_scd_inc")(spark, dir)
      .select("user_id", "version", "is_current").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // some stored open version is no longer current after the merge
    assert(merged.exists { case (u, v, cur) =>
      openVf.get(u) == Some(v) && !cur
    }, "no stored open version closed — the close edge is untested")
    // some user's version count grew past the stored max
    val mergedMax = merged.groupBy(_._1).map { case (u, vs) =>
      u -> vs.map(_._2).max }
    assert(openVf.exists { case (u, v) => mergedMax(u) > v },
      "no user gained a version — the append edge is untested")
  }

  test("pass-through: closed store versions appear verbatim") {
    val fmt = "yyyy-MM-dd HH:mm:ss"
    val closed = EventQueries.scdStore(spark, dir)
      .filter(col("valid_to_ts").isNotNull)
      .select(col("user_id"), col("version"), col("event_type"),
        date_format(col("valid_from_ts"), fmt).as("vf"),
        date_format(col("valid_to_ts"), fmt).as("vt"))
      .collect().map(_.toSeq).toSet
    assert(closed.nonEmpty)
    val merged = SparkEntry.queries("q_events_scd_inc")(spark, dir)
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"))
      .collect().map(_.toSeq).toSet
    assert(closed.subsetOf(merged),
      "a closed standing version was altered by the merge")
  }

  test("plan: delta ts range pushed; store table read") {
    val df = SparkEntry.queries("q_events_scd_inc")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_scd_store_"),
      s"serve does not read the persisted dimension:\n${plan.take(2000)}")
    assert(plan.contains("GreaterThanOrEqual(ts"),
      s"the delta ts predicate was not pushed:\n${plan.take(2000)}")
  }
}
