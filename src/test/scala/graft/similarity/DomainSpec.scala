package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** `q_embed_domain` against an independent driver-side replay of the
  * nearest-class-mean recurrence on the real sf0.001 embeddings — the
  * whole pipeline is exact long arithmetic, so the comparison is
  * equality, not tolerance. */
class DomainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Q = 1048576.0

  test("centroid assignment matches an exact driver-side replay") {
    val got = SparkEntry.queries("q_embed_domain")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3),
        r.getLong(4)))

    val rows = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray.map(v => math.floor(v.toDouble * Q).toLong)))
    val cents = rows.groupBy(_._2).map { case (l, g) =>
      val n = g.length
      l -> Array.tabulate(64)(i =>
        math.floor(g.map(_._3(i)).sum.toDouble / n).toLong)
    }
    val ref = rows.map { case (id, lab, xf) =>
      val (bd, bl) = cents.toSeq.map { case (l, c) =>
        var s = 0L; var i = 0
        while (i < 64) { val df = xf(i) - c(i); s += df * df; i += 1 }
        (s, l)
      }.minBy(identity)
      (id, lab, bl, lab == bl, bd)
    }.sortBy(_._1)

    assert(got.length == ref.length && got.nonEmpty)
    got.zip(ref).foreach { case (g, r) => assert(g == r, s"got $g want $r") }
  }

  test("labels and domains share a universe; d2 is non-negative") {
    val got = SparkEntry.queries("q_embed_domain")(spark, dir).collect()
    val labels = got.map(_.getInt(1)).toSet
    assert(got.map(_.getInt(2)).toSet.subsetOf(labels))
    assert(got.forall(_.getLong(4) >= 0L))
    assert(got.forall(r => r.getBoolean(3) == (r.getInt(1) == r.getInt(2))))
  }
}
