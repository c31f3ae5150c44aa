package graft

import org.apache.spark.sql.functions.col

/** `q_text_logprob` against an independent driver-side replay of the
  * unigram-LM recurrence on the real sf0.001 documents — token counts
  * exact, scores within a rounding ulp. */
class TextLogprobSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("n_tok and logprob match a driver-side reference at sf0.001") {
    val got = SparkEntry.queries("q_text_logprob")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // reference: same \s+ split (Java limit -1, like Spark's split),
    // corpus-wide unigram counts, mean ln p per doc
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, text) => id -> text.split("\\s+", -1) }
    val global = toks.flatMap(_._2).groupBy(identity)
      .map { case (t, g) => t -> g.length.toLong }
    val total = global.values.sum.toDouble
    val ref = toks.map { case (id, ts) =>
      val s = ts.groupBy(identity).toSeq.sortBy(_._1).map { case (t, g) =>
        g.length * math.log(global(t) / total)
      }.sum
      (id, ts.length.toLong, s / ts.length)
    }.sortBy(_._1)

    assert(got.length == ref.length && got.nonEmpty)
    got.zip(ref).foreach { case ((gi, gn, gl), (ri, rn, rl)) =>
      assert(gi == ri && gn == rn, s"doc $gi tokens $gn vs $rn")
      assert(math.abs(gl - rl) < 2e-6, s"doc $gi logprob $gl vs $rl")
    }
  }

  test("scores are negative log-probabilities (sanity bounds)") {
    val got = SparkEntry.queries("q_text_logprob")(spark, dir)
      .collect().map(_.getDouble(2))
    assert(got.forall(v => v < 0.0 && v > -30.0))
  }
}
