package graft.multimodal

import graft.SparkSpec
import graft.queries.MultimodalQueries

/** The q_mm_phash skew cap (ADVICE r7): real image corpora concentrate
  * band values (flat regions all hash 0x00/0xFF), so the band
  * equi-join's hot buckets went O(k²). [[MultimodalQueries
  * .phashCandidates]] routes oversized buckets through 7-bit sub-block
  * bucketing of the remaining 56 bits — pigeonhole twice over, so the
  * scheme stays EXACT at Hamming ≤ 7. This spec builds the adversarial
  * corpus: every document in one hot band-0 bucket, including a planted
  * pair whose ONLY equal band is the hot one (7 differing bits spread
  * one per remaining band — probabilistic banding or a "require a
  * second equal band" refinement would both drop it).
  */
class MultimodalPhashCapSpec extends SparkSpec {

  private def hamming(a: Seq[Int], b: Seq[Int]): Int =
    a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum

  test("capped phash candidates: exact recall under a hot bucket, bounded fan-out") {
    val s = spark
    import s.implicits._
    // 40 background docs: band 0 = 0x00 for ALL (one hot bucket of 44),
    // bands 1-7 deterministically spread so sub-blocks rarely collide
    val background = (0L until 40L).map { i =>
      (i, (0 +: (1 to 7).map(r => ((i * 37 + r * 101) % 256).toInt)).toArray)
    }
    // planted near-identical pair (hamming 0)
    val twins = Seq(
      (100L, Array(0, 1, 2, 3, 4, 5, 6, 7)),
      (101L, Array(0, 1, 2, 3, 4, 5, 6, 7)))
    // planted hamming-7 pair with NO equal band besides hot band 0:
    // each of bands 1-7 differs in exactly one bit
    val spread = Seq(
      (102L, Array(0, 0x10, 0x20, 0x30, 0x40, 0x50, 0x60, 0x70)),
      (103L, Array(0, 0x11, 0x22, 0x34, 0x48, 0x50 ^ 16, 0x60 ^ 32, 0x70 ^ 64)))
    val docs = background ++ twins ++ spread
    assert(hamming(spread(0)._2, spread(1)._2) === 7)
    assert((1 to 7).forall(r => spread(0)._2(r) != spread(1)._2(r)))

    val df = docs.toDF("doc_id", "bs")
    val cap = 4 // every band-0 bucket row is over the cap → tier-2 route
    val cand = MultimodalQueries.phashCandidates(df, cap)
      .as[(Long, Long)].collect().toSet
    val byId = docs.toMap
    val truth = (for {
      (i, bi) <- docs; (j, bj) <- docs
      if i < j && hamming(bi.toSeq, bj.toSeq) <= 7
    } yield (i, j)).toSet

    // exactness: every true pair is a candidate (pigeonhole twice), and
    // verification over candidates reproduces the truth set exactly
    assert(truth.subsetOf(cand), s"missing: ${truth -- cand}")
    assert(truth((102L, 103L)), "the spread pair must be a true pair")
    val verified = cand.filter { case (a, b) =>
      hamming(byId(a).toSeq, byId(b).toSeq) <= 7
    }
    assert(verified === truth)

    // skew bound: the hot band-0 bucket has 44 members = 946 all-pairs;
    // sub-block routing must generate far fewer candidates than that
    // (dissimilar docs land in different 7-bit sub-buckets)
    assert(cand.size < 400, s"fan-out not bounded: ${cand.size}")
  }
}
