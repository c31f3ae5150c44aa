package graft.similarity

import graft.SparkSpec

/** `q_embed_kmeans`: assignment self-consistency against a driver-side
  * replay of the full recurrence, determinism across runs, and
  * non-vacuity at the smallest SF. */
class KmeansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(): Map[Long, Long] =
    graft.SparkEntry.queries("q_embed_kmeans")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side replay: same init (8 smallest vec_ids), same
    * fixed-point centroid update, same argmin/tie rule. */
  private def reference(): Map[Long, Long] = {
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val q = 1048576.0
    def assign(cents: Seq[(Long, Array[Double])]): Map[Long, Long] =
      vecs.map { case (id, x) =>
        id -> cents.map { case (c, carr) =>
          var d = 0.0
          var i = 0
          while (i < 64) { val t = x(i) - carr(i); d += t * t; i += 1 }
          (d, c)
        }.min._2
      }.toMap
    def update(a: Map[Long, Long]): Seq[(Long, Array[Double])] =
      vecs.groupBy { case (id, _) => a(id) }.toSeq.sortBy(_._1)
        .map { case (c, members) =>
          val sums = Array.fill(64)(0L)
          members.foreach { case (_, x) =>
            var i = 0
            while (i < 64) {
              sums(i) += math.floor(x(i) * q).toLong; i += 1
            }
          }
          c -> sums.map(s => s.toDouble / q / members.length)
        }
    var cents = vecs.take(8).map { case (id, x) => (id, x) }.toSeq
    for (_ <- 1 to 2) cents = update(assign(cents))
    assign(cents)
  }

  test("assignments equal the driver-side recurrence replay at sf0.001") {
    val got = run()
    assert(got.nonEmpty)
    assert(got == reference())
  }

  test("deterministic across runs; all vectors assigned to a real cluster") {
    val a = run()
    val b = run()
    assert(a == b)
    assert(a.values.toSet.size > 1, "degenerate single cluster")
  }
}
