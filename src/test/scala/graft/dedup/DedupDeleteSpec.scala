package graft.dedup

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.queries.DedupQueries

/** `q_dedup_delete` / `q_dedup_compact` — the signature store's
  * forget path (takedown/opt-out removal), mirroring the ANN store's
  * tombstone → compact lifecycle.
  *
  * Laws:
  *  1. ONE LAW, TWO PATHS — the tombstone-filtered probe and the
  *     probe over the physically compacted table answer identically,
  *     row for row (they also share one oracle).
  *  2. NO TOMBSTONED DOC — no emitted pair touches a tombstoned
  *     standing document.
  *  3. TEETH — deletion genuinely changed answers: some verified pair
  *     of q_dedup_incremental is gone (a vacuous tombstone set would
  *     leave the forget path untested).
  *  4. COMPACTION — the table on disk lost EXACTLY the tombstoned
  *     rows: compacted = standing store minus the DedupDeleteRule
  *     rows, as (doc_id, band, bkey) sets.
  *  5. PLAN — the compacted serve still reads a BUCKETED store scan
  *     (compaction must not cost the probe its co-location contract).
  */
class DedupDeleteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("delete ≡ compact, row for row") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir)
      .collect().map(_.toSeq).toSeq
    val del = rows("q_dedup_delete")
    val cmp = rows("q_dedup_compact")
    assert(del.nonEmpty, "empty served pair set — the probe is vacuous")
    assert(del == cmp,
      "tombstone-filtered probe diverged from the compacted-store probe")
  }

  test("no emitted pair touches a tombstoned standing document") {
    val standing = graft.Tables.documents(spark, dir)
      .filter(col("source") =!= DedupQueries.IncNewSource)
      .filter(DedupQueries.DedupDeleteRule)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = SparkEntry.queries("q_dedup_delete")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) =>
      !standing.contains(a) && !standing.contains(b)
    }, "a tombstoned standing document still pairs after deletion")
  }

  test("teeth: deletion changed the served answers") {
    val before = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val after = SparkEntry.queries("q_dedup_delete")(spark, dir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after.subsetOf(before),
      "deletion ADDED a pair — the tombstone filter touched the wrong side")
    assert(after != before,
      "deletion removed nothing — the corpus no longer plants a " +
        "takedown-visible near-dup (fixture teeth lost; regenerate " +
        "them before suspecting the takedown logic)")
  }

  test("load-bearing provenance invariant (ADVICE r18): the stores " +
      "hold ONLY standing rows, so the bare engine-side id rule and " +
      "the source-guarded oracle predicate agree") {
    val dumpIds = graft.Tables.documents(spark, dir)
      .filter(col("source") === DedupQueries.IncNewSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sigDocs = DedupQueries.signatureStore(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(sigDocs.intersect(dumpIds).isEmpty,
      "the signature store contains dump rows — the engine's bare " +
        "DedupDeleteRule would tombstone dump documents the oracle's " +
        "standing-guarded predicate keeps")
    val phashDocs = graft.queries.MultimodalQueries
      .phashStore(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(phashDocs.intersect(dumpIds).isEmpty,
      "the pHash store contains dump rows — same divergence risk")
  }

  test("compaction dropped exactly the tombstoned rows") {
    def keys(f: org.apache.spark.sql.DataFrame) = f
      .select("doc_id", "band", "bkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val full = keys(DedupQueries.signatureStore(spark, dir))
    val compacted = keys(DedupQueries.sigStoreCompacted(spark, dir))
    val tombstoned = full.filter(_._1 % 10 == 3)
    assert(tombstoned.nonEmpty,
      "no store row matches the tombstone rule — law 4 is vacuous")
    assert(compacted == full -- tombstoned,
      "the compacted table's rows are not standing-minus-tombstones")
  }

  test("plan: the compacted serve reads a bucketed store scan") {
    val df = SparkEntry.queries("q_dedup_compact")(spark, dir)
    df.collect() // materialize so the AQE-final stages render
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("graft_sig_cmp_"),
      s"q_dedup_compact: the serve does not read the compacted table:\n" +
        s.take(2000))
    assert(s.contains("Bucketed: true"),
      s"q_dedup_compact: the compacted-store scan lost its bucketing " +
        s"— the probe's co-location contract is gone:\n${s.take(2000)}")
  }
}
