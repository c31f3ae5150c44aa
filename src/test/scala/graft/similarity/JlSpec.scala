package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}

/** `q_embed_jl`: an independent driver-side replay of the md5-parity
  * sensing matrix and fold, plus the property the projection exists
  * for — pairwise squared distances survive within the k=16 JL
  * distortion envelope on sampled pairs. */
class JlSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val K = 16

  private def sign(i: Int, j: Int): Double = {
    val hex = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s"$i,$j").substring(0, 1)
    if (Integer.parseInt(hex, 16) % 2 == 1) 1.0 else -1.0
  }

  test("projections match the replayed parity-matrix fold") {
    val got = SparkEntry.queries("q_embed_jl")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(got.size == emb.length * K)
    emb.take(50).foreach { case (id, v) =>
      (1 to K).foreach { j =>
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += v(i).toDouble * sign(i + 1, j); i += 1 }
        val y = math.floor(acc / math.sqrt(K.toDouble) * 1.0e6 + 0.5) / 1.0e6
        assert(got((id, j)) == y, s"vec $id dim $j: ${got((id, j))} vs $y")
      }
    }
  }

  test("pairwise distances survive within the k=16 distortion envelope") {
    val got = SparkEntry.queries("q_embed_jl")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val ids = emb.keys.toSeq.sorted.take(30)
    val ratios = for {
      a <- ids; b <- ids if a < b
    } yield {
      val dx = (0 until 64).map(i =>
        math.pow(emb(a)(i).toDouble - emb(b)(i).toDouble, 2)).sum
      val dy = (1 to K).map(j =>
        math.pow(got((a, j)) - got((b, j)), 2)).sum
      dy / dx
    }
    // k=16 is a coarse sketch: E[ratio] = 1, spread ~ sqrt(2/k) ≈ 0.35
    // per pair — individual pairs must stay within a generous envelope
    // and the mean must sit near 1 (an implementation bug — wrong
    // scale, dropped dims, biased signs — lands far outside both)
    assert(ratios.forall(r => r > 0.2 && r < 3.0),
      s"pair distortion escaped the envelope: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.25, s"mean distortion $mean — biased sketch")
  }
}
