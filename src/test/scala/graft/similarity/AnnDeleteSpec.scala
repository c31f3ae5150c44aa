package graft.similarity

import graft.{SparkEntry, SparkSpec}

/** `q_ann_delete` — tombstone deletes on the stored index. The laws
  * reject the wrong implementation shapes: a post-filter of the
  * undeleted top-k (short lists, no refill) and a vacuous delete set
  * (answers unchanged). */
class AnnDeleteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val deleted =
    SparkEntry.queries("q_ann_delete")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
  private lazy val undeleted =
    SparkEntry.queries("q_ann_ivfpq_stored")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq

  test("no tombstoned id is ever served, and every query still gets " +
      "a full k-list (freed slots refill from the shortlist)") {
    assert(deleted.nonEmpty)
    assert(deleted.forall { case (_, vid, _, _) => vid % 10 != 3 })
    deleted.groupBy(_._1).foreach { case (q, hits) =>
      assert(hits.map(_._4).sorted == (1 to 5),
        s"query $q: ranks ${hits.map(_._4).sorted} — a post-filter " +
          "of the undeleted top-k would leave holes here")
    }
  }

  test("deletion genuinely changed answers: tombstoned ids were " +
      "winners before, and at least one query's list moved") {
    val beforeIds = undeleted.map(_._2)
    assert(beforeIds.exists(_ % 10 == 3),
      "vacuous delete set: no tombstoned id was ever served")
    assert(deleted != undeleted)
    // surgical: some query's list is identical (deletes only touch
    // the queries whose candidates they were)
    val byQd = deleted.groupBy(_._1)
    val byQu = undeleted.groupBy(_._1)
    assert(byQd.keySet == byQu.keySet)
    assert(byQd.exists { case (q, hits) => hits == byQu(q) },
      "every query changed — delete rule is not surgical on this corpus")
  }
}
