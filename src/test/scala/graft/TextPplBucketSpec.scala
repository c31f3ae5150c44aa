package graft

/** `q_text_ppl_bucket`: the CCNet head/middle/tail partition must be a
  * partition (every doc in exactly one bucket), strictly ordered by
  * score across bucket boundaries, and near-tertile sized. */
class TextPplBucketSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run() =
    SparkEntry.queries("q_text_ppl_bucket")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))

  test("buckets partition the corpus and order strictly by score") {
    val got = run()
    val n = got.length
    assert(n > 0)
    assert(got.map(_._1).distinct.length == n, "a doc appears twice")
    val byB = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byB.keySet == Set("head", "middle", "tail"))
    // strict ordering across the cutpoints: min(head) > max(middle),
    // min(middle) > max(tail) — ties at a cut fall to the lower bucket
    assert(byB("head").min > byB("middle").max)
    assert(byB("middle").min > byB("tail").max)
  }

  test("bucket sizes are tertiles up to cutpoint ties") {
    val got = run()
    val n = got.length
    val sizes = got.groupBy(_._3).view.mapValues(_.length).toMap
    // rounded-6 scores can tie at a cut; the sf0.001 corpus has few
    // ties, so each bucket stays within a small band of n/3
    sizes.values.foreach { s =>
      assert(math.abs(s - n / 3.0) <= math.max(2, n / 10.0),
        s"bucket sizes $sizes far from tertiles of $n")
    }
    // agreement with the raw scores: the head bucket holds the
    // top-scoring docs of q_text_logprob
    val lp = SparkEntry.queries("q_text_logprob")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    got.foreach { case (id, score, _) => assert(lp(id) == score) }
  }
}
