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

  /** Deterministic synthetic corpus: n 64-dim vectors with md5-derived
    * components in [0, 1) — same values on every run, so the measured
    * cluster-size distribution is a constant of the code under test. */
  private def synth(n: Int) = {
    import org.apache.spark.sql.functions._
    spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 64), i -> cast(cast(conv(" +
        "substring(md5(concat(id, ':', i)), 1, 6), 16, 10) as double)" +
        " / 16777216.0 as float))").as("embedding"))
  }

  /** The r12 `weak`: with K frozen (the old hard-coded KmK = 8) the
    * within-cluster candidate-pair count grows ~(n/K)² — quadratic in
    * the corpus. With K scaled by [[SimilarityQueries.semanticK]] the
    * per-cluster sizes stay pinned near the target regardless of n, so
    * the pair join stays ~n·target. This test drives kmClusters through
    * the K parameter at two corpus sizes; reverting to a frozen K makes
    * it red (measured: frozen K=8 at n=1024 gives max cluster 173 and
    * 67 625 candidate pairs vs 55 / 18 517 scaled — 3× over both
    * bounds asserted here). */
  test("per-cluster pair counts stay bounded as the corpus grows when K " +
      "follows semanticK") {
    val target = 32L
    val stats = Seq(256, 1024).map { n =>
      val k = graft.queries.SimilarityQueries.semanticK(n, target)
      assert(k == ((n + target - 1) / target),
        s"semanticK must scale with n (got $k for n=$n)")
      val sizes = graft.queries.SimilarityQueries.kmClusters(synth(n), k)
        .groupBy("cluster").count()
        .collect().map(_.getLong(1))
      val maxSize = sizes.max
      val pairs = sizes.map(s => s * (s - 1) / 2).sum
      // bounded per-cluster candidate generation: the largest cluster —
      // hence the largest s(s-1)/2 pair block — stays within a constant
      // factor of the target at BOTH corpus sizes
      assert(maxSize <= 3 * target,
        s"n=$n k=$k: max cluster $maxSize exceeds 3×target — " +
          "per-cluster pair blocks are no longer bounded")
      (n, pairs)
    }
    // total candidate pairs must grow ~linearly in n (ratio ≈ 4 for a
    // 4× corpus), not quadratically (ratio ≈ 16 when K is frozen)
    val ratio = stats(1)._2.toDouble / stats(0)._2
    assert(ratio <= 8.0,
      s"candidate pairs grew ${ratio}× for a 4× corpus — quadratic, " +
        "K is not scaling")
  }

  test("q_dedup_semantic_cluster: canonical ids are the connected " +
      "components of the verified pair graph") {
    val pairs = graft.SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id").collect().map(_.getLong(0))
    // driver-side union-find over the verified pairs
    val parent = scala.collection.mutable.Map(vecs.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val canon = vecs.map(v => v -> find(v)).toMap
    val counts = canon.values.groupBy(identity).map { case (c, vs) => c -> vs.size.toLong }

    val got = graft.SparkEntry.queries("q_dedup_semantic_cluster")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == vecs.length, "one keep/drop row per vector")
    got.foreach { case (v, c, n) =>
      assert(c == canon(v), s"vec $v: canonical $c != union-find ${canon(v)}")
      assert(n == counts(canon(v)), s"vec $v: cluster_n $n != ${counts(canon(v))}")
    }
    // non-vacuous: at least one real dup component (keep-rule drops >0 rows)
    assert(got.exists { case (v, c, _) => v != c },
      "gate must contain at least one dropped duplicate")
  }
}
