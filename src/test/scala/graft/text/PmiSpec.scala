package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** `q_text_pmi` against an independent driver-side replay of the PMI
  * recurrence on the real sf0.001 documents. */
class PmiSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("top-50 collocations match a driver-side reference") {
    val got = SparkEntry.queries("q_text_pmi")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    val texts = Tables.documents(spark, dir).select(col("text"))
      .collect().map(_.getString(0))
    val toks = texts.map(_.split("\\s+", -1))
    val bigrams = toks.flatMap(ts => ts.toSeq.sliding(2)
      .collect { case Seq(a, b) => (a, b) })
    val bgc = bigrams.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val nb = bgc.values.sum.toDouble
    val uni = toks.flatten.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val n = uni.values.sum.toDouble
    val ref = bgc.toSeq.filter(_._2 >= 3).map { case ((w1, w2), cb) =>
      val raw = math.log((cb / nb) / ((uni(w1) / n) * (uni(w2) / n)))
      (w1, w2, cb, raw)
    }.sortBy { case (w1, w2, _, raw) => (-raw, w1, w2) }.take(50)
      .map { case (w1, w2, cb, raw) =>
        (w1, w2, cb, math.floor(raw * 1.0e6 + 0.5) / 1.0e6) }

    assert(got.length == ref.length && got.nonEmpty)
    got.zip(ref).foreach { case ((gw1, gw2, gc, gp), (rw1, rw2, rc, rp)) =>
      assert(gw1 == rw1 && gw2 == rw2 && gc == rc,
        s"pair ($gw1,$gw2,$gc) vs ($rw1,$rw2,$rc)")
      assert(math.abs(gp - rp) < 2e-6, s"pmi $gp vs $rp at ($gw1,$gw2)")
    }
  }

  test("collocation laws: min-count respected, list strongly associated") {
    val got = SparkEntry.queries("q_text_pmi")(spark, dir).collect()
    assert(got.length == 50)
    assert(got.forall(_.getLong(2) >= 3), "a pair below the count floor")
    // the top of the collocation list on natural-ish text is positively
    // associated (pmi > 0 = the pair co-occurs above chance)
    assert(got.forall(_.getDouble(3) > 0.0), "a top-50 pair at/below chance")
  }
}
