package graft.dedup

import graft.SparkSpec
import graft.queries.DedupQueries

/** [[DedupQueries.clusterAssign]]: canonical assignment is the
  * TRANSITIVE closure of the pair list (a chain a~b, b~c clusters all
  * three even though a~c was never emitted), canonical = min doc_id,
  * singletons keep themselves at cluster_n = 1. */
class DedupClusterSpec extends SparkSpec {

  private def assign(docs: Seq[Long], pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    DedupQueries.clusterAssign(docs.toDF("doc_id"), pairs.toDF("a", "b"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  test("chains cluster transitively, canonical is the min id") {
    val got = assign(Seq(1L, 2L, 3L, 4L, 5L, 6L),
      Seq(1L -> 2L, 2L -> 3L, 5L -> 6L))
    assert(got == Map(
      1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)),
      4L -> ((4L, 1L)),
      5L -> ((5L, 2L)), 6L -> ((5L, 2L))))
  }

  test("no pairs: every document is its own singleton cluster") {
    val got = assign(Seq(10L, 20L), Seq.empty)
    assert(got == Map(10L -> ((10L, 1L)), 20L -> ((20L, 1L))))
  }

  test("cluster sizes sum to the document count") {
    val docs = (1L to 50L).toSeq
    val pairs = Seq(1L -> 50L, 2L -> 49L, 49L -> 48L, 10L -> 20L)
    val got = assign(docs, pairs)
    assert(got.size == 50)
    // each cluster contributes cluster_n once per member; Σ n over
    // distinct canonicals = |docs|
    val perCluster = got.values.groupBy(_._1).map { case (c, vs) =>
      assert(vs.map(_._2).toSet.size == 1, s"inconsistent size in $c")
      vs.head._2
    }
    assert(perCluster.sum == 50L)
  }
}
