package graft

/** `q_text_dsir`: the hashed-bucket importance weights equal a
  * driver-side replay of the full DSIR recurrence (same grams, same
  * md5 buckets, same add-1 smoothed log-ratio, same bucket-sorted
  * fold), plus sign sanity — the target-language slice must score
  * higher on average than the rest. */
class TextDsirSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val B = 256

  private def run(): Seq[(Long, Long, Double)] =
    SparkEntry.queries("q_text_dsir")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq

  private def docs(): Seq[(Long, String, String)] =
    Tables.documents(spark, dir).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  private def buckets(text: String): Seq[Long] = {
    val toks = text.split("\\s+", -1).toSeq
    val grams = toks ++ toks.sliding(2).filter(_.size == 2)
      .map(_.mkString(" "))
    grams.map { g =>
      val bs = g.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      graft.functions.ShingleHashUtil.hash32(bs, 0, bs.length) % B
    }.toSeq
  }

  private def reference(): Seq[(Long, Long, Double)] = {
    val d = docs()
    val perDoc = d.map { case (id, lang, text) =>
      (id, lang, buckets(text).groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
    val raw = perDoc.flatMap(_._3.toSeq).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val tgt = perDoc.filter(_._2 == "en").flatMap(_._3.toSeq).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val nr = raw.values.sum
    val nt = tgt.values.sum
    def lam(b: Long): Double =
      math.log((tgt.getOrElse(b, 0L) + 1).toDouble / (nt + B)) -
        math.log((raw(b) + 1).toDouble / (nr + B))
    perDoc.sortBy(_._1).map { case (id, _, m) =>
      val s = m.toSeq.sortBy(_._1)
        .foldLeft(0.0) { case (acc, (b, mb)) => acc + mb * lam(b) }
      (id, m.values.sum,
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
  }

  test("weights equal the driver-side DSIR replay at sf0.001") {
    val got = run()
    assert(got.nonEmpty)
    assert(got == reference())
  }

  test("the target-language slice scores higher on average") {
    val lang = docs().map(t => t._1 -> t._2).toMap
    val byLang = run().groupBy(r => lang(r._1))
      .view.mapValues(g => g.map(_._3).sum / g.size).toMap
    assert(byLang("en") > (byLang - "en").values.max)
  }
}
