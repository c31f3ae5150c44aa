package graft

/** `q_text_curate` against the five gates it composes: canonical_id
  * from q_dedup_cluster, kept from q_text_quality_cut, gopher_keep
  * from q_text_gopher, contaminated from q_text_decontaminate_bloom,
  * split from q_dedup_split — per-column equality on each, plus the
  * decision law selected = kept ∧ canonical ∧ gopher_keep ∧
  * ¬contaminated ∧ ¬is_eval, which implies at most one survivor per
  * near-dup cluster and no eval-set doc ever selected. */
class CurateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("curate = cluster × quality-cut × gopher × decontaminate × " +
      "split, decision law holds") {
    val curate = SparkEntry.queries("q_text_curate")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7), r.getString(8), r.getBoolean(9)))).toMap
    val cluster = SparkEntry.queries("q_dedup_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = SparkEntry.queries("q_text_quality_cut")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val gopher = SparkEntry.queries("q_text_gopher")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    val decont = SparkEntry.queries("q_text_decontaminate_bloom")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val split = SparkEntry.queries("q_dedup_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

    assert(curate.keySet == cluster.keySet, "curate must cover the corpus")
    curate.foreach { case (id, (src, canon, kept, gk, isEval, cont,
        side, selected)) =>
      assert(canon == cluster(id), s"doc $id: canonical mismatch")
      assert(kept == cut(id), s"doc $id: kept mismatch")
      assert(gk == gopher(id), s"doc $id: gopher mismatch")
      assert(isEval == (src == "src0"), s"doc $id: is_eval mismatch")
      // per-column equality on the decontaminate gate's domain (the
      // non-eval corpus); the eval dump itself is fixed false — its
      // exclusion rides is_eval, not a contamination claim
      assert(cont == decont.getOrElse(id, false),
        s"doc $id: contaminated mismatch")
      assert(side == split(id), s"doc $id: split mismatch")
      assert(selected == (kept && id == canon && gk && !cont && !isEval),
        s"doc $id: decision law")
    }
    // at most one survivor per cluster, and some docs actually survive
    val survivors = curate.collect {
      case (id, (_, c, _, _, _, _, _, true)) => (id, c)
    }
    assert(survivors.nonEmpty)
    assert(survivors.groupBy(_._2).forall(_._2.size == 1),
      "two survivors in one near-dup cluster")
    // every stage of the recipe prunes someone the others would keep
    assert(curate.exists { case (id, (_, c, k, _, _, _, _, _)) =>
      k && id != c }, "no kept-but-duplicate doc exercised")
    assert(curate.exists { case (id, (_, c, k, _, _, _, _, _)) =>
      !k && id == c }, "no canonical-but-low-quality doc exercised")
    assert(curate.exists { case (id, (_, c, k, gk, ev, cont, _, _)) =>
      k && id == c && !ev && !cont && !gk },
      "no gopher-screened doc exercised")
    assert(curate.exists { case (_, (src, _, _, _, ev, _, _, _)) => ev },
      "the eval dump is missing from the frame")
    assert(curate.forall { case (_, (_, _, _, _, ev, _, _, sel)) =>
      !(ev && sel) }, "an eval-set document was selected for training")
  }
}
