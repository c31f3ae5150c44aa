package graft.similarity

import graft.SparkSpec
import graft.queries.SimilarityQueries

/** Recall@k gates for the approximate ANN family (VERDICT r7 item 4).
  *
  * The DuckDB hash gates prove each ANN variant computes exactly the
  * deterministic program it claims — they cannot see "deterministically
  * wrong neighbors" (an index whose buckets never contain the true
  * neighbors would still hash-match its own oracle). This spec closes
  * that hole: recall@5 of each sublinear variant against
  * q_ann_bruteforce on the SAME query set must clear a floor.
  *
  * Floors are set just below each operator's MEASURED recall on the
  * sf0.01 corpus — which is near-orthogonal noise (top-cosine ≈ 0.37,
  * neighbors uncorrelated with the label column), the adversarial
  * case for a sublinear index: LSH (2 independent 6-plane tables,
  * Hamming ≤ 2 multiprobe) measures 0.92; IVF (5 cells, nprobe=3)
  * measures 0.84; PQ (M=16 codes, ADC top-100 shortlist + exact
  * cosine refine) measures 1.0. The pipelines are deterministic, so a
  * floor breach means someone changed buckets/probes/codes/refine in
  * a way that destroyed usefulness, even if the hash gate still
  * passes.
  */
class AnnRecallSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"
  private val K = 5

  private def topk(name: String): Map[Long, Set[Long]] =
    graft.SparkEntry.queries(name)(spark, Dir)
      .select("qid", "vec_id")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  private def recallAt5(approx: Map[Long, Set[Long]],
      exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / K
    }
    per.sum / per.size
  }

  test("ANN variants clear their recall@5 floors vs brute force") {
    val exact = topk("q_ann_bruteforce")
    assert(exact.nonEmpty && exact.forall(_._2.size == K))

    val floors = Seq(
      "q_ann_lsh" -> 0.7,
      "q_ann_ivf" -> 0.7,
      "q_ann_pq" -> 0.8,
      // composed index: recall is IVF-containment-bound (the ADC
      // shortlist within probed cells loses nothing vs exact scoring)
      "q_ann_ivfpq" -> 0.7)
    val recalls = floors.map { case (name, floor) =>
      (name, floor, recallAt5(topk(name), exact))
    }
    recalls.foreach { case (name, floor, r) =>
      info(f"$name%-12s recall@5 = $r%.3f (floor $floor)")
    }
    recalls.foreach { case (name, floor, r) =>
      assert(r >= floor,
        f"$name recall@5 $r%.3f fell below its $floor floor — the index " +
          "no longer finds true neighbors even though its hash gate passes")
    }
    // and brute force against itself is trivially 1 — sanity of the rig
    assert(recallAt5(exact, exact) === 1.0)
  }
}
