package graft.text

import graft.{SparkEntry, SparkSpec}

/** `q_text_curate_clf` — the curation frame whose quality gate is the
  * TRAINED classifier (VERDICT r16 item 2: GPT-3/CCNet filter on the
  * trained curated-vs-crawl score, not a heuristic blend; since r18
  * the STORED sampled-trained model, q_text_clf_stored): per-column
  * equality against the gates it composes (classifier score/verdict
  * from q_text_clf_stored, everything else from q_text_curate), the
  * decision law selected = clf_keep ∧ canonical ∧ gopher ∧
  * ¬contaminated ∧ ¬is_eval, and the teeth check that the trained
  * gate genuinely DISAGREES with the heuristic cut on this corpus —
  * a classifier that just relabels the heuristic would make the gate
  * vacuous. */
class CurateClfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val rows =
    SparkEntry.queries("q_text_curate_clf")(spark, dir).collect()

  test("clf_score equals q_text_classifier per document, the heuristic " +
      "kept column equals q_text_curate's, and clf_keep is the " +
      "top-quartile retention law (a strict upper set of scores)") {
    // the STORED sampled-trained production model (r17 item 5) — the
    // curation gate reads the persisted artifact, not the full-corpus
    // training q_text_classifier pins
    val clf = SparkEntry.queries("q_text_clf_stored")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val curate = SparkEntry.queries("q_text_curate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(5) == clf(id),
        s"doc $id: classifier score diverged from q_text_clf_stored " +
          "— the stored-model artifact forked")
      assert(r.getBoolean(4) == curate(id),
        s"doc $id: heuristic kept diverged from q_text_curate")
    }
    // the retention-threshold law: kept docs are exactly the PER-TOKEN
    // mean scores (the fastText/CCNet averaged-evidence form — a raw
    // summed margin just ranks by length) strictly above the p75 cut —
    // so the kept set is a strict upper set of score/n (every kept
    // value beats every dropped value; equal values always agree),
    // non-empty on both sides, and ≤ ~a quarter of the corpus
    import org.apache.spark.sql.functions.{col, filter => afilter,
      greatest, lit, size, split}
    val nTok = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        greatest(size(afilter(split(col("text"), "\\s+"),
          t => t =!= lit(""))), lit(1)).cast("double").as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def qn(r: org.apache.spark.sql.Row) = r.getLong(5) / nTok(r.getLong(0))
    val (keptS, dropS) = rows.partition(_.getBoolean(6))
    assert(keptS.nonEmpty, "clf_keep vacuously false — the threshold " +
      "gate degenerated like the sign gate it replaced")
    assert(dropS.nonEmpty, "clf_keep vacuously true")
    assert(keptS.map(qn).min > dropS.map(qn).max,
      "clf_keep is not an upper set of per-token scores — not a " +
        "threshold rule")
    assert(keptS.size <= rows.size / 4 + 1,
      s"top-quartile cut kept ${keptS.size} of ${rows.size}")
  }

  test("decision law: selected = clf_keep && canonical && gopher && " +
      "!contaminated && !is_eval — the TRAINED verdict is the quality " +
      "gate, on every row") {
    assert(rows.exists(_.getBoolean(11)), "no doc selected — vacuous")
    rows.foreach { r =>
      val want = r.getBoolean(6) && r.getLong(0) == r.getLong(2) &&
        r.getBoolean(7) && !r.getBoolean(9) && !r.getBoolean(8)
      assert(r.getBoolean(11) == want, s"doc ${r.getLong(0)}: decision law")
    }
  }

  test("teeth: the trained gate disagrees with the heuristic cut on " +
      "this corpus, in both directions where possible") {
    assert(rows.exists(r => r.getBoolean(6) != r.getBoolean(4)),
      "clf_keep == kept on every doc — the trained gate relabels the " +
        "heuristic and the composition proves nothing")
    // and the disagreement changes the shipped corpus, not just a
    // column: some doc is selected here but not under the heuristic
    // law (or vice versa)
    assert(rows.exists { r =>
      val heur = r.getBoolean(4) && r.getLong(0) == r.getLong(2) &&
        r.getBoolean(7) && !r.getBoolean(9) && !r.getBoolean(8)
      heur != r.getBoolean(11)
    }, "the trained gate never flips a selection decision")
  }
}
