package graft.similarity

import graft.SparkSpec

/** `q_embed_knn`: the within-cluster kNN graph agrees with a
  * driver-side replay (same cluster blocking, same cosine ranking), and
  * its structural invariants hold — neighbors share the vector's
  * cluster, ranks are dense from 1, cosines are non-increasing. */
class KnnGraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(): Seq[(Long, Long, Double, Int)] =
    graft.SparkEntry.queries("q_embed_knn")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq

  private def clusters(): Map[Long, Long] =
    graft.SparkEntry.queries("q_embed_kmeans")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** The engine's memoized top-2 multiprobe assignment (its row-1
    * equality with the argmin assignment is pinned below; the argmin
    * itself is pinned against a full driver replay by KmeansSpec). */
  private def probes(): Map[Long, Set[Long]] =
    graft.queries.SimilarityQueries.kmAssignments2(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("every neighbor edge lands in one of the query's two probed " +
      "cells, and probe 1 is exactly the argmin cluster") {
    val a = clusters()
    val p = probes()
    assert(p.values.forall(s => s.nonEmpty && s.size <= 2))
    assert(a.forall { case (v, c) => p(v).contains(c) })
    val r = rows()
    assert(r.nonEmpty)
    assert(r.forall { case (v, nb, _, _) => p(v).contains(a(nb)) })
  }

  test("neighbor lists equal the driver-side multiprobe top-3 replay") {
    val a = clusters()
    val p = probes()
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < 64) {
        d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val expect = a.keys.toSeq.sorted.flatMap { v =>
      a.keys.toSeq
        .filter(nb => nb != v && p(v).contains(a(nb)))
        .map(nb => (nb, cos(vecs(v), vecs(nb))))
        .sortBy { case (nb, c) => (-c, nb) }
        .take(3)
        .zipWithIndex
        .map { case ((nb, _), i) => (v, nb, i + 1) }
    }
    val got = rows().map { case (v, nb, _, rk) => (v, nb, rk) }
    assert(got == expect)
  }

  test("multiprobe recall@3 vs global brute force clears the floor") {
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < 64) {
        d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val global = vecs.keys.map { v =>
      v -> vecs.keys.filter(_ != v)
        .map(n => (n, cos(vecs(v), vecs(n)))).toSeq
        .sortBy(t => (-t._2, t._1)).take(3).map(_._1).toSet
    }.toMap
    val knn = rows().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = global.keys.toSeq.map { v =>
      knn.getOrElse(v, Set.empty[Long]).intersect(global(v)).size / 3.0
    }
    val mean = recall.sum / recall.size
    // measured 0.515 at nprobe=2 on this near-orthogonal corpus (the
    // adversarial case for any blocked index — AnnRecallSpec's story);
    // single-probe measured 0.31, so the floor also proves the second
    // probe is actually wired in
    assert(mean >= 0.45, f"recall@3 $mean%.3f below floor")
  }

  test("label cleaning equals the majority vote over the kNN lists") {
    val labels = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byVec = rows().groupBy(_._1)
    val expect = labels.keys.toSeq.sorted.map { v =>
      val nn = byVec.get(v) match {
        case Some(g) =>
          g.map(t => labels(t._2)).groupBy(identity).toSeq
            .map { case (l, c) => (-c.size, l) }.min._2
        case None => labels(v)
      }
      (v, labels(v), nn, labels(v) == nn)
    }
    val got = graft.SparkEntry.queries("q_embed_label_clean")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
      .toSeq
    assert(got == expect)
    // the gate is non-vacuous only if some label actually disagrees
    assert(got.exists(!_._4))
    assert(got.exists(_._4))
  }

  test("feature smoothing equals the fixed-point mean over self + kNN") {
    val q = 1048576.0
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val nn = rows().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expect = vecs.keys.toSeq.sorted.map { v =>
      val members = v +: nn.getOrElse(v, Seq.empty)
      val sums = Array.fill(64)(0L)
      members.foreach { m =>
        var i = 0
        while (i < 64) {
          sums(i) += math.floor(vecs(m)(i) * q).toLong; i += 1
        }
      }
      (v, members.size.toLong,
        sums.map(s => math.floor(s.toDouble / members.size).toLong)
          .mkString(","))
    }
    val got = graft.SparkEntry.queries("q_embed_smooth")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expect)
  }

  test("ranks are dense from 1 and cosines non-increasing per vector") {
    rows().groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4) == (1 to sorted.size))
      assert(sorted.map(_._3).sliding(2).forall {
        case Seq(x, y) => x >= y
        case _ => true
      })
    }
  }
}
