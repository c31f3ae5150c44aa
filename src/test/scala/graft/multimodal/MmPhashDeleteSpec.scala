package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.queries.{DedupQueries, MultimodalQueries}

/** `q_mm_phash_delete` / `q_mm_phash_compact` — the pHash store's
  * forget path, completing the delete/compact column of the store
  * lifecycle matrix.
  *
  * Laws:
  *  1. ONE LAW, TWO PATHS — the tombstone-filtered probe and the
  *     compacted-table probe answer identically (they share one
  *     oracle).
  *  2. NO TOMBSTONED ASSET — no emitted pair touches a tombstoned
  *     standing asset.
  *  3. TEETH — deletion genuinely removed a served pair.
  *  4. COMPACTION — the table on disk lost exactly the tombstoned
  *     rows, as (doc_id, band, bkey, blk, bval) sets.
  *  5. CROSS-INDEX TAKEDOWN — the tombstone set is the SAME rule the
  *     text signature store forgets: a doc removed from one index is
  *     removed from both (what a real takedown means).
  */
class MmPhashDeleteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("delete ≡ compact, row for row; deletion changed answers") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir)
      .collect().map(_.toSeq).toSeq
    val del = rows("q_mm_phash_delete")
    val cmp = rows("q_mm_phash_compact")
    assert(del.nonEmpty, "empty served pair set — the probe is vacuous")
    assert(del == cmp,
      "tombstone-filtered probe diverged from the compacted-store probe")
    val before = rows("q_mm_phash_inc").map(r => (r(0), r(1))).toSet
    val after = del.map(r => (r(0), r(1))).toSet
    assert(after.subsetOf(before) && after != before,
      "deletion added a pair or removed nothing")
  }

  test("no emitted pair touches a tombstoned standing asset") {
    val standing = graft.Tables.documents(spark, dir)
      .filter(col("source") =!= DedupQueries.IncNewSource)
      .filter(DedupQueries.DedupDeleteRule)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    SparkEntry.queries("q_mm_phash_delete")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .foreach { case (a, b) =>
        assert(!standing.contains(a) && !standing.contains(b),
          s"tombstoned asset still pairs: ($a, $b)")
      }
  }

  test("compaction dropped exactly the tombstoned rows") {
    def keys(f: org.apache.spark.sql.DataFrame) = f
      .select("doc_id", "band", "bkey", "blk", "bval").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.get(2), r.get(3), r.get(4)))
      .toSet
    val full = keys(MultimodalQueries.phashStore(spark, dir))
    val compacted = keys(MultimodalQueries.phashStoreCompacted(spark, dir))
    val tombstoned = full.filter(_._1 % 10 == 3)
    assert(tombstoned.nonEmpty, "no store row matches the tombstone rule")
    assert(compacted == full -- tombstoned,
      "the compacted table's rows are not standing-minus-tombstones")
  }

  test("cross-index takedown: every pre-delete pair with a tombstoned " +
      "standing endpoint vanishes from BOTH indexes (victims DERIVED " +
      "from the serves, not hardcoded — ADVICE r18)") {
    val tombstoned = graft.Tables.documents(spark, dir)
      .filter(col("source") =!= DedupQueries.IncNewSource)
      .filter(DedupQueries.DedupDeleteRule)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def pairs(q: String) = SparkEntry.queries(q)(spark, dir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def victims(pre: Set[(Long, Long)]) = pre.filter { case (a, b) =>
      tombstoned(a) || tombstoned(b)
    }
    val textVictims = victims(pairs("q_dedup_incremental"))
    val phashVictims = victims(pairs("q_mm_phash_inc"))
    // teeth (fixture-derived): if either set is empty the corpus no
    // longer plants a takedown-visible near-dup — regenerate teeth
    // before trusting the delete gates, the logic is not at fault
    assert(textVictims.nonEmpty,
      "no text-served pair touches a tombstoned doc — fixture teeth " +
        "lost, not a takedown bug")
    assert(phashVictims.nonEmpty,
      "no pHash-served pair touches a tombstoned asset — fixture " +
        "teeth lost, not a takedown bug")
    assert(textVictims.intersect(pairs("q_dedup_delete")).isEmpty,
      "the text index still serves a pair with a tombstoned endpoint")
    assert(phashVictims.intersect(pairs("q_mm_phash_delete")).isEmpty,
      "the pHash index still serves a pair with a tombstoned endpoint")
    // the same documents die in both indexes where both hashed them:
    // a doc the rule forgets must pair in NEITHER serve
    val forgotten = textVictims.union(phashVictims)
      .flatMap { case (a, b) => Seq(a, b) }.filter(tombstoned)
    val after = pairs("q_dedup_delete").union(pairs("q_mm_phash_delete"))
      .flatMap { case (a, b) => Seq(a, b) }
    assert(forgotten.intersect(after).isEmpty,
      "a forgotten doc still pairs in some index after the takedown")
  }
}
