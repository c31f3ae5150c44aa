package graft.similarity

import graft.SparkSpec

/** `q_embed_kcenter`: assignment equality against a driver-side replay
  * of the greedy farthest-point recurrence, center self-assignment, and
  * determinism (the KmeansSpec pattern). */
class KcenterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(): Seq[(Long, Long, Double)] =
    graft.SparkEntry.queries("q_embed_kcenter")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq

  /** Driver-side replay: same init (MIN vec_id), same incremental
    * LEAST update, same (m DESC, vec_id ASC) argmax and
    * (d2 ASC, cid ASC) assignment tie rules, same index-order folds. */
  private def reference(): Seq[(Long, Long, Double)] = {
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def d2(x: Array[Double], c: Array[Double]): Double = {
      var d = 0.0
      var i = 0
      while (i < 64) { val t = x(i) - c(i); d += t * t; i += 1 }
      d
    }
    var cents = Seq(vecs.head)
    var mind = vecs.map { case (id, x) => (id, x, d2(x, cents.head._2)) }
    for (_ <- 2 to 4) {
      val (nid, nx, _) = mind.minBy { case (id, _, m) => (-m, id) }
      cents = cents :+ (nid -> nx)
      mind = mind.map { case (id, x, m) =>
        (id, x, math.min(m, d2(x, nx)))
      }
    }
    vecs.map { case (id, x) =>
      val (bd, bc) = cents.map { case (c, carr) => (d2(x, carr), c) }.min
      (id, bc, bd)
    }.toSeq
  }

  test("assignments equal the driver-side greedy replay at sf0.001") {
    val got = run()
    assert(got.nonEmpty)
    assert(got == reference())
  }

  test("exactly k centers, each self-assigned at distance zero") {
    val self = run().filter { case (id, c, _) => id == c }
    assert(self.size == 4)
    assert(self.forall(_._3 == 0.0))
  }

  test("deterministic across runs") {
    assert(run() == run())
  }
}
