package graft.dedup

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.DedupQueries

/** `q_dedup_append2` — RE-ENTRANT signature-store accretion (VERDICT
  * r18 item 1, dedup family): both dump waves appended in arrival
  * order, wave B probing the store's OWN rows cross-only.
  *
  * Laws:
  *  1. RE-ENTRANCY — the cross-only probe of the twice-appended store
  *     equals q_dedup_store_append's probe row for row (two appends ≡
  *     one append ≡ rebuild, all stated by the one shared oracle).
  *  2. STORE ≡ REBUILD — the twice-appended table's row set equals a
  *     from-scratch sketch of the FULL corpus (standing ∪ dump): the
  *     direct store-level statement that neither append dropped,
  *     duplicated, nor corrupted rows.
  *  3. WAVES NON-EMPTY — both appends genuinely carried rows.
  *  4. TEETH — the served pairs include a cross pair whose standing-
  *     probing route needs wave A IN the store (derived from the
  *     output, not hardcoded — the MmPhashDeleteSpec ADVICE lesson).
  */
class DedupAppend2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("twice-appended probe == single-append probe, row for row") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toSeq).toSeq
    val two = rows("q_dedup_append2")
    assert(two.nonEmpty, "no pairs touch wave B — the gate is vacuous")
    assert(two == rows("q_dedup_store_append"),
      "the twice-appended store's probe diverged from the " +
        "single-append probe")
  }

  test("store row set == from-scratch sketch of standing ∪ dump") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("doc_id"), col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    val stored = key(DedupQueries.sigStoreAppended2(spark, dir))
    val rebuilt = key(DedupQueries.bandedSigs(
      Tables.documents(spark, dir)))
    assert(stored.nonEmpty)
    assert(stored == rebuilt,
      "the twice-appended store's (doc_id, band, bkey) multiset " +
        "diverged from the from-scratch sketch — an append dropped, " +
        "duplicated, or mis-wrote rows")
  }

  test("both waves carried rows and the mark advanced") {
    val mid = DedupQueries.incMidpoint(spark, dir)
    val dump = Tables.documents(spark, dir)
      .filter(col("source") === DedupQueries.IncNewSource)
    val nA = dump.filter(col("doc_id") <= lit(mid)).count()
    val nB = dump.filter(col("doc_id") > lit(mid)).count()
    assert(nA > 0, "wave A is empty — the first append is vacuous")
    assert(nB > 0, "wave B is empty — the probe is vacuous")
  }

  test("teeth: a served pair crosses the waves (B sees A via the store)") {
    val mid = DedupQueries.incMidpoint(spark, dir)
    val dumpIds = Tables.documents(spark, dir)
      .filter(col("source") === DedupQueries.IncNewSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val waveA = dumpIds.filter(_ <= mid)
    val waveB = dumpIds.filter(_ > mid)
    val pairs = SparkEntry.queries("q_dedup_append2")(spark, dir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.exists { case (a, b) =>
        (waveA(a) && waveB(b)) || (waveB(a) && waveA(b)) },
      "no served pair crosses wave A × wave B — the corpus no longer " +
        "exercises the append-then-probe handoff (regenerate teeth " +
        "before trusting this gate)")
  }
}
