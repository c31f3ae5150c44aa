package graft

/** `q_text_curate` against the three gates it composes: canonical_id
  * from q_dedup_cluster, kept from q_text_quality_cut, split from
  * q_dedup_split — and the decision law selected = kept ∧ canonical,
  * which implies at most one survivor per near-dup cluster. */
class CurateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("curate = cluster × quality-cut × split, decision law holds") {
    val curate = SparkEntry.queries("q_text_curate")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(4),
        r.getString(5), r.getBoolean(6)))).toMap
    val cluster = SparkEntry.queries("q_dedup_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = SparkEntry.queries("q_text_quality_cut")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val split = SparkEntry.queries("q_dedup_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

    assert(curate.keySet == cluster.keySet, "curate must cover the corpus")
    curate.foreach { case (id, (canon, kept, side, selected)) =>
      assert(canon == cluster(id), s"doc $id: canonical mismatch")
      assert(kept == cut(id), s"doc $id: kept mismatch")
      assert(side == split(id), s"doc $id: split mismatch")
      assert(selected == (kept && id == canon), s"doc $id: decision law")
    }
    // at most one survivor per cluster, and some docs actually survive
    val survivors = curate.collect { case (id, (c, _, _, true)) => (id, c) }
    assert(survivors.nonEmpty)
    assert(survivors.groupBy(_._2).forall(_._2.size == 1),
      "two survivors in one near-dup cluster")
    // the composition prunes BOTH ways: some dropped for quality, some
    // as non-canonical dups
    assert(curate.exists { case (id, (c, k, _, _)) => k && id != c },
      "no kept-but-duplicate doc exercised")
    assert(curate.exists { case (id, (c, k, _, _)) => !k && id == c },
      "no canonical-but-low-quality doc exercised")
  }
}
