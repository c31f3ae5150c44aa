package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}

/** `q_embed_hardneg`: structural properties against the catalog's own
  * frames — every emitted negative really has a different label, is
  * at least as close as any different-label vector the kNN graph
  * already ranked for that anchor (knn candidates ⊆ hardneg
  * candidates, same blocking), and the anchors that drop out are
  * exactly those whose probed clusters hold no different-label
  * vector. */
class HardNegSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("hardest negative: different label, dominates the kNN graph's " +
      "different-label entries, drop-outs are label-pure blocks") {
    val got = SparkEntry.queries("q_embed_hardneg")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))).toMap
    assert(got.nonEmpty)
    val labels = Tables.embeddings(spark, dir).select("vec_id", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    got.foreach { case (id, (lab, negId, negLab, _)) =>
      assert(lab == labels(id), s"anchor $id label drifted")
      assert(negLab == labels(negId) && negLab != lab,
        s"anchor $id: negative $negId label $negLab vs anchor $lab")
    }
    // dominance: any different-label neighbor in the kNN graph is no
    // closer than the mined negative (identical candidate blocking)
    val knn = SparkEntry.queries("q_embed_knn")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    knn.filter { case (id, nb, _) => labels(id) != labels(nb) }
      .foreach { case (id, nb, cos) =>
        val (_, _, _, hc) = got(id)
        assert(hc >= cos,
          s"anchor $id: knn holds a closer imposter $nb ($cos > $hc)")
      }
  }
}
