package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** `q_text_pack_curated` — train-data assembly: the clf-gated curation
  * decision feeding the fixed-budget sequence packer, keyed by the
  * leakage-safe split.
  *
  * Laws:
  *  1. COMPOSITION — the packed set is EXACTLY q_text_curate_clf's
  *     selected set (no doc invented, none dropped), with each doc's
  *     split agreeing row-for-row.
  *  2. BUDGET — within every (split, source, shard) chain, cum_tokens
  *     resets exactly when the budget would overflow: a row either
  *     fits under 512 or starts a new sequence; sequence ids are dense
  *     from 0 in doc_id order.
  *  3. SPLIT PURITY HAS TEETH — packing WITHOUT the split key would
  *     put train and test docs in the same sequence on this corpus
  *     (the eval-contamination bug class the key exists to prevent):
  *     re-pack the selected set keyed by (source, shard) alone and
  *     find a mixed sequence.
  */
class PackCuratedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val Limit = 512L

  test("packed set == the curation gate's selected set, split agreeing") {
    val packed = SparkEntry.queries("q_text_pack_curated")(spark, dir)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val selected = SparkEntry.queries("q_text_curate_clf")(spark, dir)
      .filter(col("selected")).select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(selected.nonEmpty, "vacuous selection on this corpus")
    assert(packed == selected,
      s"packed ${packed.size} docs, curation selected ${selected.size}")
  }

  test("budget law: fit-or-reset within every chain; dense seq ids") {
    val rows = SparkEntry.queries("q_text_pack_curated")(spark, dir)
      .select("split", "source", "shard", "seq_id", "cum_tokens", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2, t._3)).foreach { case (key, chain) =>
      val inOrder = chain.sortBy(_._6)
      var prevSeq = 0L
      var prevCum = 0L
      inOrder.zipWithIndex.foreach { case ((_, _, _, seq, cum, id), i) =>
        val n = if (seq == prevSeq && i > 0) cum - prevCum else cum
        assert(n > 0, s"$key doc $id: nonpositive token count $n")
        if (i == 0) assert(seq == 0L, s"$key: first seq_id $seq != 0")
        else if (seq == prevSeq)
          assert(cum <= Limit,
            s"$key doc $id: cum $cum exceeds the budget without a reset")
        else {
          assert(seq == prevSeq + 1,
            s"$key doc $id: seq_id jumped $prevSeq -> $seq")
          assert(prevCum + n > Limit,
            s"$key doc $id: reset fired though $prevCum + $n fit")
        }
        prevSeq = seq; prevCum = cum
      }
    }
  }

  test("the split key has teeth: packing without it would mix train " +
      "and test in one sequence") {
    val sel = SparkEntry.queries("q_text_curate_clf")(spark, dir)
      .filter(col("selected"))
      .select("doc_id", "source", "split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(sel.map(_._3).toSet.size > 1,
      "corpus has a single split — the purity law is unobservable")
    // re-pack by (source, shard) only, seq boundaries at the real
    // token counts — reuse the gate's own cum arithmetic via its
    // output (n = cum deltas), so this re-pack needs no tokenizer
    val packed = SparkEntry.queries("q_text_pack_curated")(spark, dir)
      .select("doc_id", "seq_id", "cum_tokens", "split", "source", "shard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getInt(5)))
    val nTok = packed.groupBy(t => (t._4, t._5, t._6)).iterator.flatMap {
      case (_, chain) =>
        val inOrder = chain.sortBy(_._1)
        inOrder.zipWithIndex.map { case ((id, seq, cum, _, _, _), i) =>
          val n = if (i > 0 && seq == inOrder(i - 1)._2)
            cum - inOrder(i - 1)._3 else cum
          id -> n
        }
    }.toMap
    val mixed = sel.groupBy(t => (t._2, t._1 % 4)).exists {
      case (_, group) =>
        var cum = 0L
        var seqDocs = List.empty[String]
        var found = false
        group.sortBy(_._1).foreach { case (id, _, split) =>
          val n = nTok(id)
          if (cum + n > Limit && cum > 0) {
            if (seqDocs.toSet.size > 1) found = true
            seqDocs = Nil; cum = 0
          }
          seqDocs ::= split; cum += n
        }
        found || seqDocs.toSet.size > 1
    }
    assert(mixed,
      "split-blind packing never mixed splits on this corpus — the " +
        "purity law is vacuous here; pick a corpus where it bites")
  }
}
