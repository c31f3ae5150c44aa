package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.queries.EventQueries

/** `q_events_scd_late` / [[EventQueries.scdMergeWithLate]] — late
  * (out-of-order) events in the SCD2 merge. The driver corpus cannot
  * produce late data (its dumps are ts-defined), so the late branch's
  * laws are pinned on CONSTRUCTED feeds — the StreamGraphMaintainSpec
  * pattern.
  *
  * Laws:
  *  1. MERGED-WITH-LATE ≡ REBUILD-ON-REORDERED-LOG — on feeds where
  *     late events (a) create new versions, (b) collapse against the
  *     state at their ts, and (c) RESURRECT a collapsed standing
  *     update (the case that makes store-only reopening unsound).
  *  2. THE COUNTEREXAMPLE FIRES — naively chaining the store's rows
  *     with the late event genuinely diverges on fixture (c): the
  *     full-log rebuild leg is load-bearing, not defensive.
  *  3. UNAFFECTED ISOLATION — users without late events get rows
  *     identical to the plain merge (the quarantine never touches
  *     them).
  *  4. GATE IDENTITY — on the real corpus the late set is empty and
  *     q_events_scd_late ≡ q_events_scd_inc ≡ q_events_scd.
  */
class ScdLateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** (user, event_id, minute, type) rows → an events frame. */
  private def log(rows: (Long, Long, Double, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "m", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_millis((col("m") * 60000).cast("long")).as("ts"),
        col("event_type"))
  }

  private def serve(dim: DataFrame) = dim
    .select(col("user_id"), col("event_type"), col("valid_from_ts"),
      col("valid_to_ts"), col("version"))
    .collect().map(_.toSeq).toSet

  // standing log (below mark at minute 100) for three users:
  //   u1: A@1, A@2 (collapses), B@3  — the resurrection fixture
  //   u2: A@10, B@20                 — gets a plain late insert
  //   u3: A@50                       — never touched by late data
  private val standing = log(
    (1L, 101L, 1.0, "A"), (1L, 102L, 2.0, "A"), (1L, 103L, 3.0, "B"),
    (2L, 201L, 10.0, "A"), (2L, 202L, 20.0, "B"),
    (3L, 301L, 50.0, "A"))
  private val markUs = 100L * 60000000L // minute 100 in epoch micros

  test("merged-with-late == rebuild-on-reordered-log: new-version, " +
      "collapse, and resurrection late cases") {
    // dump: on-time C@110 for u3; late B@1.5 for u1 (RESURRECTS the
    // collapsed A@2); late A@15 for u2 (a plain mid-chain insert);
    // late B@25 for u2 (collapses against the state at 25 — B since
    // minute 20 — so it must NOT create a version)
    val dump = log(
      (3L, 311L, 110.0, "C"),
      (1L, 111L, 1.5, "B"),
      (2L, 211L, 15.0, "A"),
      (2L, 212L, 25.0, "B"))
    val store = EventQueries.scdOf(standing)
    val full = standing.unionByName(dump)
    val merged = serve(EventQueries.scdMergeWithLate(
      store, dump, full, markUs))
    val rebuilt = serve(EventQueries.scdOf(full))
    assert(merged == rebuilt,
      s"late-aware merge diverged from the reordered-log rebuild:\n" +
        s"merged  $merged\nrebuilt $rebuilt")
    // the resurrection genuinely happened: u1 has 4 versions now
    // (A@1, B@1.5, A@2, B@3) — A@2 is a change again
    assert(rebuilt.count(_.head == 1L) == 4,
      "fixture drift: u1's late insert no longer resurrects A@2")
    // the collapse case genuinely collapsed: u2's truth is A@10
    // (A@15 collapses against it), B@20 (B@25 collapses) — exactly
    // the standing 2 versions, late events absorbed without a trace
    assert(rebuilt.count(_.head == 2L) == 2,
      "fixture drift: u2's late events no longer exercise the " +
        "collapse edges")
  }

  test("the counterexample fires: store-only reopening is UNSOUND on " +
      "the resurrection fixture (the full-log leg is load-bearing)") {
    val dump = log((1L, 111L, 1.5, "B"))
    val store = EventQueries.scdOf(standing)
    // the naive path: treat the late event like an on-time delta and
    // chain it onto the store's rows
    val naive = serve(EventQueries.scdMergeOf(store,
      dump.select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))))
    val truth = serve(EventQueries.scdOf(standing.unionByName(dump)))
    assert(naive != truth,
      "the naive store-only chain now matches the rebuild — the " +
        "counterexample fixture lost its teeth (collapsed row no " +
        "longer resurrects); strengthen the fixture")
  }

  test("unaffected users are untouched by the quarantine") {
    val dump = log((1L, 111L, 1.5, "B"), (3L, 311L, 110.0, "C"))
    val store = EventQueries.scdOf(standing)
    val full = standing.unionByName(dump)
    val merged = EventQueries.scdMergeWithLate(store, dump, full, markUs)
    val plain = EventQueries.scdMergeOf(store,
      dump.filter(col("user_id") =!= 1L))
    def rowsFor(df: DataFrame, u: Long) = serve(df.filter(col("user_id") === u))
    Seq(2L, 3L).foreach { u =>
      assert(rowsFor(merged, u) == rowsFor(plain, u),
        s"user $u has no late events but the quarantine changed its rows")
    }
  }

  test("gate identity on the real corpus: empty late set, " +
      "late-aware == plain merge == rebuild") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toSeq).toSeq
    val late = rows("q_events_scd_late")
    assert(late.nonEmpty)
    assert(late == rows("q_events_scd_inc"),
      "with no late data the late-aware merge must be an identity " +
        "over the plain merge")
    assert(late == rows("q_events_scd"),
      "late-aware merge diverged from the full-log rebuild")
  }
}
