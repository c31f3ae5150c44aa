package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.SimilarityQueries

/** `q_ann_maintain` (VERDICT r14 item 4) — the drift-triggered index
  * lifecycle: the q_embed_drift monitor decides retrain-vs-append, and
  * BOTH branches are pinned row-for-row against their reference forms
  * (the AnnIncrementalSpec pattern). At sf0.01 the decision is RETRAIN
  * (the small dump slice drifts past the bound) and the standing
  * quantizers genuinely differ from the full-corpus ones (the standing
  * slice loses IVF seed 450), so the two branches produce materially
  * different indexes — the decision is never moot. The sf0.1 gate run
  * exercises the APPEND side of the same law (driver correctness
  * gate). */
class AnnMaintainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq

  test("decision law: retrain iff max per-label drift exceeds the bound " +
      "(and sf0.01 sits in the retrain regime)") {
    val maxShift = SparkEntry.queries("q_embed_drift")(spark, dir)
      .collect().map(_.getLong(3)).max
    val decided = SimilarityQueries.maintainRetrain(spark, dir)
    assert(decided == (maxShift > SimilarityQueries.MaintainShiftBound),
      s"decision diverged from the drift monitor (max=$maxShift)")
    assert(decided, "sf0.01 must drift past the bound — if the corpus " +
      "regenerated calmer, re-pick MaintainShiftBound so both branches " +
      "stay exercised across the gated SFs")
  }

  test("gate output == the decided branch, with the decision stated " +
      "in the retrained column") {
    val got = SparkEntry.queries("q_ann_maintain")(spark, dir).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getBoolean(4)), "retrained flag must state the " +
      "sf0.01 decision (retrain)")
    val search = got
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(search == rows(SparkEntry.queries("q_ann_ivfpq_stored")(spark, dir)),
      "retrain branch diverged from the rebuilt full store's search")
  }

  test("forced append branch == the one-shot encode-all reference " +
      "(per-row encode under frozen standing quantizers)") {
    val append = rows(SimilarityQueries.maintainAppendSearch(spark, dir))
    val ref = rows(SimilarityQueries.maintainAppendReference(spark, dir))
    assert(append.nonEmpty && append == ref,
      s"append (${append.size}) diverged from one-shot (${ref.size})")
  }

  test("the decision is not moot: standing-trained and retrained " +
      "quantizers disagree on some answer at sf0.01") {
    val append = rows(SimilarityQueries.maintainAppendSearch(spark, dir))
    val retrain = rows(SimilarityQueries.maintainRetrainSearch(spark, dir))
    assert(append != retrain,
      "append and retrain coincide — the standing slice no longer " +
        "drops a quantizer seed; the fixture lost its point")
  }

  test("the maintenance store holds exactly the below-threshold ids " +
      "(the pre-dump index)") {
    val thr = SimilarityQueries.incVecThreshold(spark, dir)
    val all = Tables.embeddings(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val standing = SimilarityQueries.annStoreMaint(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(standing == all.filter(_ < thr) && standing.nonEmpty)
  }
}
