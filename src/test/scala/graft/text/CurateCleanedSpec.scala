package graft.text

import graft.{SparkEntry, SparkSpec}

/** `q_text_curate_cleaned` — the Lee'22 §5 / RefinedWeb composition
  * (VERDICT r15 gap 1): exact-substring span removal runs BEFORE
  * quality scoring and the Gopher screen, so excised spans change the
  * verdicts. The laws: the removal genuinely feeds the scorer (scores
  * and rule flags MOVE on excised docs — the r15 catalog scored raw
  * text, which these assertions reject), intact documents score
  * exactly as the raw recipe (excision is surgical), and the
  * n_removed accounting matches the removal gate's (one digest law,
  * two consumers). */
class CurateCleanedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val cleaned =
    SparkEntry.queries("q_text_curate_cleaned")(spark, dir).collect()
  private lazy val rawByDoc =
    SparkEntry.queries("q_text_curate")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(5))).toMap

  test("excised spans genuinely change the verdicts: every excised " +
      "doc's quality moved, and some Gopher screens flipped") {
    val excised = cleaned.filter(_.getLong(2) > 0)
    assert(excised.length > 0, "vacuous fixture: nothing was removed")
    val qMoved = excised.count(r =>
      rawByDoc(r.getLong(0))._1 != r.getDouble(3))
    val gFlipped = excised.count(r =>
      rawByDoc(r.getLong(0))._2 != r.getBoolean(5))
    assert(qMoved == excised.length,
      s"only $qMoved of ${excised.length} excised docs changed " +
        "quality — the scorer is reading raw text")
    assert(gFlipped > 0,
      "no Gopher screen flipped — the rule columns are reading raw text")
  }

  test("intact documents (n_removed = 0) score exactly as the raw " +
      "recipe: excision is surgical, and the single-space re-join " +
      "round-trips the token list") {
    val intact = cleaned.filter(_.getLong(2) == 0)
    assert(intact.length > 0)
    intact.foreach { r =>
      val (qRaw, gRaw) = rawByDoc(r.getLong(0))
      assert(qRaw == r.getDouble(3) && gRaw == r.getBoolean(5),
        s"doc ${r.getLong(0)}: intact but scored differently")
    }
  }

  test("n_removed matches the removal gate per document (shared " +
      "digest law — the two gates cannot disagree on what's a dup)") {
    val fromRemoval =
      SparkEntry.queries("q_dedup_substring_removed")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    cleaned.foreach { r =>
      assert(fromRemoval(r.getLong(0)) == r.getLong(2),
        s"doc ${r.getLong(0)}: removal accounting diverged")
    }
  }
}
