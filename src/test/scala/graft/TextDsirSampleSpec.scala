package graft

import java.security.MessageDigest

/** `q_text_dsir_sample`: the Gumbel-top-k draw must select exactly the
  * top-K docs by logw + Gumbel(md5-uniform), agree with q_text_dsir's
  * weights, and be a deterministic fixed-size sample. */
class TextDsirSampleSpec extends SparkSpec {

  // sf0.01 (500 docs), not sf0.001: the draw keeps K=100, and a corpus
  // smaller than K would make the selection assertions vacuous
  private val dir = "/root/testdata/sf0.01"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def gumbelKey(docId: Long, logw: Double): Double = {
    val h = java.lang.Long.parseLong(md5hex(s"dsir-sample:$docId").take(8), 16)
    val u = (h + 0.5) / 4294967296.0
    logw - math.log(-math.log(u))
  }

  test("the draw is the top-K by the replayed Gumbel key") {
    val sample = SparkEntry.queries("q_text_dsir_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val weights = SparkEntry.queries("q_text_dsir")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap

    assert(sample.length == math.min(100, weights.size))
    assert(sample.map(_._1).distinct.length == sample.length)
    // weights agree with the weight operator bit-for-bit
    sample.foreach { case (id, w, _) => assert(weights(id) == w, s"doc $id") }
    // keys match the replay within the ln-ulp contract
    sample.foreach { case (id, w, k) =>
      assert(math.abs(k - gumbelKey(id, w)) < 2e-6, s"doc $id key $k")
    }
    // selection: every sampled key clears every unsampled key (up to
    // the same ulp tolerance at the boundary)
    val sampled = sample.map(_._1).toSet
    val outMax = weights.collect {
      case (id, w) if !sampled.contains(id) => gumbelKey(id, w)
    }.maxOption.getOrElse(Double.NegativeInfinity)
    val inMin = sample.map(_._3).min
    assert(inMin >= outMax - 2e-6,
      s"an unsampled doc outranks a sampled one: $inMin < $outMax")
  }

  test("weighting matters: the draw is not just the top weights") {
    val sample = SparkEntry.queries("q_text_dsir_sample")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val weights = SparkEntry.queries("q_text_dsir")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    if (weights.length > 100) {
      val topByW = weights.sortBy { case (id, w) => (-w, id) }
        .take(sample.size).map(_._1).toSet
      assert(sample != topByW,
        "Gumbel noise had no effect — this is a plain top-k, not a draw")
    }
  }
}
