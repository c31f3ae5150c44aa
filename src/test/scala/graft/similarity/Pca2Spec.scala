package graft.similarity

import graft.{SparkEntry, SparkSpec}

/** `q_embed_pca2` against the single-component gate it extends, plus
  * the properties that make the second output a second PRINCIPAL
  * component and not just another deterministic number: the two
  * snapped directions are near-orthogonal (deflation), pc2 carries
  * less variance than pc1 but is a genuine spread (nonzero), and the
  * two projections are near-uncorrelated over the corpus. */
class Pca2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("pc1 is bit-identical to q_embed_pca; pc2 is orthogonal new signal") {
    val one = SparkEntry.queries("q_embed_pca")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val two = SparkEntry.queries("q_embed_pca2")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(two.nonEmpty)
    two.foreach { case (id, pc1, _) =>
      assert(pc1 == one(id), s"vec $id: pc1 drifted from q_embed_pca")
    }
    val p1 = two.map(_._2)
    val p2 = two.map(_._3)
    def stats(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / xs.length)
    }
    val (m1, var1) = stats(p1)
    val (m2, var2) = stats(p2)
    assert(var2 > 0, "pc2 collapsed to a constant")
    assert(var1 >= var2 * 0.999,
      s"second component out-varies the first: $var1 vs $var2")
    // near-uncorrelated projections (deflation worked): |corr| small
    val covP = p1.zip(p2).map { case (a, b) => (a - m1) * (b - m2) }
      .sum / p1.length
    val corr = covP / math.sqrt(var1 * var2)
    assert(math.abs(corr) < 0.05, s"pc1/pc2 correlation $corr — not deflated")
  }
}
