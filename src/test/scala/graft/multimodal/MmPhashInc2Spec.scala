package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.multimodal.Multimodal
import graft.queries.{DedupQueries, MultimodalQueries}

/** `q_mm_phash_inc2` — RE-ENTRANT pHash-store accretion (VERDICT r18
  * item 1, multimodal family): both dump slices appended in arrival
  * order, the full dump probing the store cross-only.
  *
  * Laws:
  *  1. RE-ENTRANCY — the cross-only probe of the twice-appended store
  *     equals q_mm_phash_inc's probe row for row (the one shared
  *     oracle states append∘append ≡ rebuild).
  *  2. STORE ≡ REBUILD — the twice-appended table's tier-2 row set
  *     equals a from-scratch hash of ALL assets: the direct store-
  *     level re-entrancy statement (on this corpus every dump-touching
  *     pair is cross-route, so the pair set alone cannot witness the
  *     dump rows' presence — this row-set law can).
  *  3. WAVES NON-EMPTY — both appends carried hashable assets.
  */
class MmPhashInc2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("twice-appended probe == standing-store probe, row for row") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toSeq).toSeq
    val two = rows("q_mm_phash_inc2")
    assert(two.nonEmpty, "no pairs touch the dump — the gate is vacuous")
    assert(two == rows("q_mm_phash_inc"),
      "the twice-appended store's probe diverged from the standing " +
        "probe + within route")
  }

  test("store row set == from-scratch tier-2 hash of all assets") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("doc_id"), col("band"), col("bkey"), col("blk"),
        col("bval"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    val stored = key(MultimodalQueries.phashStoreAppended2(spark, dir))
    val rebuilt = key(MultimodalQueries.tier2Rows(
      Multimodal.aHashBands(Multimodal.assets(spark, dir), 32)))
    assert(stored.nonEmpty)
    assert(stored == rebuilt,
      "the twice-appended pHash store's tier-2 multiset diverged " +
        "from the from-scratch hash — an append dropped, duplicated, " +
        "or mis-wrote rows")
  }

  test("both waves carried hashable assets and the mark advanced") {
    val mid = DedupQueries.incMidpoint(spark, dir)
    val dump = Multimodal.assets(spark, dir)
      .filter(col("meta.origin") === DedupQueries.IncNewSource
        && octet_length(col("payload")) >= 256)
    val nA = dump.filter(col("doc_id") <= lit(mid)).count()
    val nB = dump.filter(col("doc_id") > lit(mid)).count()
    assert(nA > 0, "wave A has no hashable assets — append 1 vacuous")
    assert(nB > 0, "wave B has no hashable assets — append 2 vacuous")
  }
}
