package graft.text

import graft.SparkSpec
import graft.queries.TextQueries

/** `q_text_classifier`'s batch-perceptron trainer on a CONSTRUCTED
  * linearly-separable corpus — the driver corpus's source labels are
  * synthetic noise (the gate checks determinism), so learner sanity
  * must be proven here: a vocabulary-separable corpus is classified
  * perfectly after the fixed epochs, training is partitioning-
  * invariant (exact integer program), and the score really is the
  * learned margin (positives score higher than every negative). */
class PerceptronSpec extends SparkSpec {

  // ClfPos sources carry "curated"-vocabulary tokens; the rest crawl
  // tokens; shared filler in both so the learner must find the signal
  private def corpus = {
    val s = spark
    import s.implicits._
    val rows =
      (1L to 20L).map(i => (i, s"src${(i % 4)}",
        "polished careful prose filler common words " * 5)) ++
      (21L to 40L).map(i => (i, s"src${4 + (i % 10)}",
        "spam noise junk clutter filler common words " * 5))
    rows.toDF("doc_id", "source", "text")
  }

  test("separable corpus is classified perfectly after the fixed epochs") {
    val out = TextQueries.perceptronTrain(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.length == 40)
    out.foreach { case (id, label, _, pred) =>
      assert(pred == (label == 1L), s"doc $id misclassified")
    }
    val posMin = out.filter(_._2 == 1L).map(_._3).min
    val negMax = out.filter(_._2 == -1L).map(_._3).max
    assert(posMin > 0 && negMax <= 0,
      s"margin not learned: posMin=$posMin negMax=$negMax")
  }

  test("training is partitioning-invariant (exact integer program)") {
    val a = TextQueries.perceptronTrain(corpus)
      .orderBy("doc_id").collect().toSeq
    val b = TextQueries.perceptronTrain(corpus.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
