package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.TextQueries

/** `q_text_clf_stored` — the persisted sampled-trained production
  * classifier (train once on the md5-half sample, store the weight
  * vector, serve scoring as one narrow pass).
  *
  * Laws:
  *  1. STORED ≡ FRESH — scoring the corpus under the PERSISTED weight
  *     table equals scoring under weights freshly trained on the same
  *     sample, row for row (the artifact-store law).
  *  2. SAMPLE — the training sample is a proper non-trivial subset
  *     (neither empty nor the whole corpus), deterministic.
  *  3. AGREEMENT — the sampled model's retention decision (the
  *     top-quartile per-token-mean cut the curation gate applies)
  *     agrees with the full-corpus-trained model's on most documents;
  *     the measured rate is reported (VERDICT r17 item 5's
  *     quantification).
  */
class ClfStoredSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("stored weights serve == freshly sampled-trained serve") {
    val docs = Tables.documents(spark, dir)
    val fresh = TextQueries.perceptronScore(
      TextQueries.clfFeatures(docs),
      TextQueries.perceptronWeights(
        TextQueries.clfFeatures(docs.filter(TextQueries.ClfSampleRule))))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val stored = SparkEntry.queries("q_text_clf_stored")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty)
    assert(stored == fresh,
      "the persisted weight table diverged from a fresh sampled training")
  }

  test("the sample is a deterministic proper subset") {
    val n = Tables.documents(spark, dir).count()
    val ns = Tables.documents(spark, dir)
      .filter(TextQueries.ClfSampleRule).count()
    assert(ns > 0 && ns < n,
      s"sample $ns of $n — not a proper subset, the sampling law is " +
        "vacuous")
    // and the stored table is the full ClfB-long vector
    val w = TextQueries.clfWeightsStore(spark, dir).count()
    assert(w == 256, s"weight table has $w rows, expected ClfB = 256")
  }

  test("agreement with the full-corpus model's retention decision, " +
      "measured") {
    def keeps(scores: org.apache.spark.sql.DataFrame): Map[Long, Boolean] = {
      val toks = split(col("text"), "\\s+")
      val nTok = Tables.documents(spark, dir).select(col("doc_id"),
        greatest(size(filter(toks, t => t =!= lit(""))), lit(1))
          .cast("double").as("n"))
      val qn = scores.join(nTok, Seq("doc_id"))
        .select(col("doc_id"),
          (col("score").cast("double") / col("n")).as("qn"))
      val cut = qn.agg(expr("percentile(qn, 0.75)")).head.getDouble(0)
      qn.collect().map(r => r.getLong(0) -> (r.getDouble(1) > cut)).toMap
    }
    val full = keeps(SparkEntry.queries("q_text_classifier")(spark, dir))
    val samp = keeps(SparkEntry.queries("q_text_clf_stored")(spark, dir))
    assert(full.keySet == samp.keySet)
    val agree = full.keys.count(k => full(k) == samp(k))
    val rate = agree.toDouble / full.size
    info(f"sampled-vs-full retention agreement: $agree/${full.size} " +
      f"= $rate%.4f")
    // chance baseline for two INDEPENDENT quartile cuts is
    // 0.75² + 0.25² = 0.625; this corpus is by-design unseparable
    // (the q_text_classifier note), so the scores are noisy and the
    // measured rate (0.764 at sf0.01) quantifies sampling stability
    // of a noisy model, not model quality. The floor detects
    // COLLAPSE to chance — the failure mode where the sample stops
    // carrying the corpus's signal at all.
    assert(rate > 0.7,
      f"the half-sample model agrees with the full model on only " +
        f"$rate%.3f of retention decisions — at the 0.625 chance " +
        "baseline the sample no longer stands in for the corpus")
  }
}
