package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** `q_embed_bitext` laws on the real corpora: the mined set is a
  * PARTIAL MATCHING across the parity split (mutual argmax ⇒ no vector
  * appears twice), every pair clears the ratio threshold, and the gate
  * is non-vacuous at both the smoke and gate SFs. */
class BitextSpec extends SparkSpec {

  private def mined(dir: String) =
    SparkEntry.queries("q_embed_bitext")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("mined pairs form a cross-parity partial matching above the " +
      "threshold (sf0.001)") {
    val rows = mined("/root/testdata/sf0.001")
    assert(rows.nonEmpty, "bitext gate is vacuous at sf0.001")
    assert(rows.forall { case (s, t, _) => s % 2 == 0 && t % 2 == 1 },
      "a mined pair violates the side split")
    assert(rows.map(_._1).distinct.length == rows.length,
      "a source vector was mined twice — mutual argmax broken")
    assert(rows.map(_._2).distinct.length == rows.length,
      "a target vector was mined twice — mutual argmax broken")
    // ≥, not >: the engine thresholds on the RAW margin and then
    // rounds half-up to the 1e-6 grid, so a mined raw margin in
    // (1.05, 1.0500005) legitimately PRESENTS as exactly 1.05
    assert(rows.forall(_._3 >= 1.05), "a mined margin below threshold")
  }

  test("every mined pair is a genuine embedding pair with the margin's " +
      "numerator equal to the true cosine sign-consistently (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // margin > 1.05 with a mean-of-top-k denominator can only select a
    // pair whose cosine strictly exceeds the mean of each endpoint's
    // best cross-side cosines — in particular the mined cosine must be
    // positive unless BOTH neighborhoods are negative-mean; on this
    // corpus assert the positive case (a sign flip here means the
    // margin denominators got crossed).
    mined(dir).foreach { case (s, t, m) =>
      assert(emb.contains(s) && emb.contains(t))
      assert(cos(emb(s), emb(t)) > 0.0,
        s"mined pair ($s,$t) margin $m has non-positive cosine")
    }
  }

  test("gate is non-vacuous at the driver SF (sf0.01)") {
    assert(mined("/root/testdata/sf0.01").nonEmpty)
  }
}
