package graft.similarity

import graft.{SparkEntry, SparkSpec}

/** `q_ann_ivfpq_stored` — the persisted bucketed index — must return
  * EXACTLY what the in-session q_ann_ivfpq path returns: same probes,
  * same ADC, same shortlist, same refine, only the index storage
  * differs. Row-for-row equality including ranks and unrounded
  * cosines; storing an index must never change an answer. */
class AnnStoredSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("stored-index probe == in-session ivfpq, row for row") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val stored = rows("q_ann_ivfpq_stored")
    val mem = rows("q_ann_ivfpq")
    assert(stored.nonEmpty)
    assert(stored == mem,
      s"stored (${stored.size}) diverged from in-session (${mem.size})")
  }
}
