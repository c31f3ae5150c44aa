package graft.similarity

import graft.SparkSpec

/** `q_dedup_semantic`: exact within-cluster completeness against a
  * driver-side brute force over the (already independently verified)
  * kmeans assignment, and the deliberate cross-cluster blindness that
  * is SemDeDup's recall trade. */
class SemanticDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pairs = exactly the within-cluster cosine >= 0.4 pairs") {
    val clusters =
      graft.SparkEntry.queries("q_embed_kmeans")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < 64) {
        d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val expected = (for {
      (a, xa) <- vecs
      (b, xb) <- vecs
      if a < b && clusters(a) == clusters(b) && cos(xa, xb) >= 0.4
    } yield (a, b)).toSet

    val got = graft.SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got.nonEmpty, "gate must be non-vacuous at sf0.001")
    assert(got == expected,
      s"extra=${got -- expected} missing=${expected -- got}")
  }

  test("cross-cluster near-dups are deliberately absent (the blocking trade)") {
    val clusters =
      graft.SparkEntry.queries("q_embed_kmeans")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"($a,$b) crosses clusters")
    }
  }
}
