package graft

import org.apache.spark.sql.functions.col

/** `q_text_bigram_lm` against an independent driver-side replay of the
  * interpolated bigram recurrence on the real sf0.001 documents —
  * bigram counts exact, scores within a rounding ulp — plus the
  * ordering laws the mixture must satisfy. */
class TextBigramLmSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("n_bigram and logprob_bi match a driver-side reference at sf0.001") {
    val got = SparkEntry.queries("q_text_bigram_lm")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // reference: same \s+ split (Java limit -1, like Spark's split),
    // corpus bigram/context/unigram counts, λ-mixture, mean ln p per doc
    val lam = 0.75
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, text) => id -> text.split("\\s+", -1) }
    val bigrams = toks.map { case (id, ts) => id -> ts.toSeq.sliding(2)
      .collect { case Seq(a, b) => (a, b) }.toSeq }
    val bgc = bigrams.flatMap(_._2).groupBy(identity)
      .map { case (p, g) => p -> g.length.toLong }
    val ctx = bgc.toSeq.groupBy(_._1._1)
      .map { case (w1, g) => w1 -> g.map(_._2).sum }
    val uni = toks.flatMap(_._2).groupBy(identity)
      .map { case (t, g) => t -> g.length.toLong }
    val total = uni.values.sum.toDouble
    val ref = bigrams.filter(_._2.nonEmpty).map { case (id, bs) =>
      val s = bs.groupBy(identity).toSeq.sortBy(_._1).map { case (p, g) =>
        val prob = lam * (bgc(p).toDouble / ctx(p._1)) +
          (1.0 - lam) * (uni(p._2) / total)
        g.length * math.log(prob)
      }.sum
      (id, bs.length.toLong, s / bs.length)
    }.sortBy(_._1)

    assert(got.length == ref.length && got.nonEmpty)
    got.zip(ref).foreach { case ((gi, gn, gl), (ri, rn, rl)) =>
      assert(gi == ri && gn == rn, s"doc $gi bigrams $gn vs $rn")
      assert(math.abs(gl - rl) < 2e-6, s"doc $gi logprob_bi $gl vs $rl")
    }
  }

  test("mixture law: every score is a valid mean log-probability and the " +
      "bigram LM is no less confident than the unigram floor on its own " +
      "training corpus") {
    val bi = SparkEntry.queries("q_text_bigram_lm")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bi.values.forall(v => v < 0.0 && v > -30.0))
    // corpus-level: the context-conditional model assigns higher mean
    // likelihood than the unigram on the corpus it was estimated from
    // (standard LM fact; with λ = 0.75 the conditional term dominates)
    val un = SparkEntry.queries("q_text_logprob")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val shared = bi.keySet.intersect(un.keySet).toSeq
    assert(shared.nonEmpty)
    val meanBi = shared.map(bi).sum / shared.size
    val meanUn = shared.map(un).sum / shared.size
    assert(meanBi > meanUn,
      s"bigram mean $meanBi should beat unigram mean $meanUn")
  }
}
