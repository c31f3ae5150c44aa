package graft.text

import graft.{SparkEntry, SparkSpec}

/** `q_text_curate_cleaned` — the FULL published recipe in its real
  * order (Lee'22 §5, RefinedWeb): exact-substring span removal runs
  * BEFORE quality scoring and the Gopher screen; canonicalization and
  * decontamination compose in; the split stays canonical-keyed. Laws:
  * the removal genuinely feeds the scorer (scores and rule flags MOVE
  * on excised docs — the r15 catalog scored raw text, which these
  * assertions reject), intact documents score exactly as the raw
  * recipe, the n_removed accounting matches the removal gate, the
  * shared artifacts (canonical_id, split) agree with q_text_curate,
  * and the w = 8 SUBSUMPTION law holds: any 8-gram shared with an
  * eval doc occurs ≥ 2× corpus-wide, so the excision already removed
  * it — cleaned-text contamination is empty while the raw recipe
  * flags documents. */
class CurateCleanedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // (doc_id, source, canonical_id, n_removed, quality, kept,
  //  gopher_keep, is_eval, contaminated, split, selected)
  private lazy val cleaned =
    SparkEntry.queries("q_text_curate_cleaned")(spark, dir).collect()
  // q_text_curate: (doc_id, source, canonical_id, quality, kept,
  //  gopher_keep, is_eval, contaminated, split, selected)
  private lazy val raw =
    SparkEntry.queries("q_text_curate")(spark, dir).collect()
  private lazy val rawByDoc =
    raw.map(r => r.getLong(0) ->
      (r.getDouble(3), r.getBoolean(5))).toMap

  test("excised spans genuinely change the verdicts: every excised " +
      "doc's quality moved, and some Gopher screens flipped") {
    val excised = cleaned.filter(_.getLong(3) > 0)
    assert(excised.length > 0, "vacuous fixture: nothing was removed")
    val qMoved = excised.count(r =>
      rawByDoc(r.getLong(0))._1 != r.getDouble(4))
    val gFlipped = excised.count(r =>
      rawByDoc(r.getLong(0))._2 != r.getBoolean(6))
    assert(qMoved == excised.length,
      s"only $qMoved of ${excised.length} excised docs changed " +
        "quality — the scorer is reading raw text")
    assert(gFlipped > 0,
      "no Gopher screen flipped — the rule columns are reading raw text")
  }

  test("intact documents (n_removed = 0) score exactly as the raw " +
      "recipe: excision is surgical, and the single-space re-join " +
      "round-trips the token list") {
    val intact = cleaned.filter(_.getLong(3) == 0)
    assert(intact.length > 0)
    intact.foreach { r =>
      val (qRaw, gRaw) = rawByDoc(r.getLong(0))
      assert(qRaw == r.getDouble(4) && gRaw == r.getBoolean(6),
        s"doc ${r.getLong(0)}: intact but scored differently")
    }
  }

  test("n_removed matches the removal gate per document (shared " +
      "digest law — the two gates cannot disagree on what's a dup)") {
    val fromRemoval =
      SparkEntry.queries("q_dedup_substring_removed")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    cleaned.foreach { r =>
      assert(fromRemoval(r.getLong(0)) == r.getLong(3),
        s"doc ${r.getLong(0)}: removal accounting diverged")
    }
  }

  test("canonical_id and split agree with q_text_curate per document " +
      "(one memoized LSH run, one split law — dedup is on raw text)") {
    val rawCs = raw.map(r =>
      r.getLong(0) -> (r.getLong(2), r.getString(8))).toMap
    cleaned.foreach { r =>
      assert(rawCs(r.getLong(0)) == ((r.getLong(2), r.getString(9))),
        s"doc ${r.getLong(0)}: canonical/split diverged from the " +
          "raw recipe")
    }
  }

  // COUPLING (VERDICT r16 watch 3): `contaminated` on cleaned text is
  // provably constant-false exactly while the excision window width
  // equals the decontamination gram width (both w = 8 — excision
  // removes any 8-gram shared >= 2x corpus-wide, and the eval set is a
  // corpus subset, so every eval-overlapping 8-gram is already gone).
  // If EITHER width moves (DedupQueries' substring-removal w, or the
  // decontamination gram width in q_text_curate_cleaned), the column
  // silently re-opens — and THIS test is the one that fails: the
  // cleaned-side assert below trips on the first genuinely
  // contaminated cleaned doc, and the raw-side teeth check keeps the
  // pin from passing vacuously.
  test("the w = 8 subsumption law (Lee'22 §6): exact-substring " +
      "removal already excised every eval-overlapping 8-gram — " +
      "cleaned-text contamination is EMPTY while the raw recipe " +
      "flags documents") {
    assert(raw.exists(_.getBoolean(7)),
      "teeth check: the raw recipe flags no contamination on this " +
        "corpus — the subsumption pin is vacuous")
    assert(!cleaned.exists(_.getBoolean(8)),
      "a cleaned doc still overlaps the eval set: either a stitched " +
        "gram appeared (tokens made adjacent by excision) or the " +
        "removal missed a duplicated window")
  }

  test("the decision law: selected == kept && canonical && gopher && " +
      "!contaminated && !is_eval, on every row") {
    assert(cleaned.exists(_.getBoolean(10)))
    cleaned.foreach { r =>
      val want = r.getBoolean(5) && r.getLong(0) == r.getLong(2) &&
        r.getBoolean(6) && !r.getBoolean(8) && !r.getBoolean(7)
      assert(r.getBoolean(10) == want, s"doc ${r.getLong(0)}")
    }
  }
}
