package graft.text

import graft.{SparkEntry, SparkSpec, Tables}

/** `q_text_plagiarism` against an independent driver-side replay of
  * the whole MOSS pipeline (char-8-gram hash → w=4 winnowing → df-cap
  * postings → pair overlap), plus the winnowing guarantee the gate's
  * scale story rests on: the selected set is a subset of the shingle
  * hashes with the documented ~2/(w+1) density. */
class PlagiarismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val MaxDf = 10
  private val MinShared = 2

  private def hashes(text: String): Seq[Long] =
    (1 to text.length - 7).map { i =>
      val g = text.substring(i - 1, i - 1 + 8)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16)
    }

  private def winnow(hs: Seq[Long]): Seq[Long] =
    if (hs.length < 4) Seq.empty
    else (0 to hs.length - 4).map(i => hs.slice(i, i + 4).min).distinct

  test("pairs, shared counts and overlaps match the replay") {
    val got = SparkEntry.queries("q_text_plagiarism")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), winnow(hashes(r.getString(1)))))
      .filter(_._2.nonEmpty)
    val df = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val kept = df.filter { case (_, c) => c >= 2 && c <= MaxDf }
      .keySet.toSet
    val fpSets = docs.map { case (id, fps) => id -> fps.toSet }.toMap
    val expected = (for {
      (a, fa) <- docs; (b, fb) <- docs if a < b
      shared = fpSets(a).intersect(fpSets(b)).count(kept)
      if shared >= MinShared
    } yield ((a, b), (shared.toLong, fa.length.toLong, fb.length.toLong,
      shared.toDouble / math.min(fa.length, fb.length).toDouble))).toMap

    assert(expected.nonEmpty)
    assert(got.keySet == expected.keySet,
      s"extra=${got.keySet -- expected.keySet} " +
        s"missing=${expected.keySet -- got.keySet}")
    got.foreach { case (k, v) => assert(v == expected(k), s"pair $k") }
  }

  test("winnowing selects a sparse subset of the shingle hashes") {
    Tables.documents(spark, dir).select("text").limit(50)
      .collect().map(_.getString(0)).filter(_.length >= 64).foreach { t =>
        val hs = hashes(t)
        val fps = winnow(hs)
        assert(fps.toSet.subsetOf(hs.toSet))
        // density ~2/(w+1) on random-ish hashes; generous ceiling
        assert(fps.length <= hs.length / 2 + 1,
          s"selection not sparse: ${fps.length} of ${hs.length}")
      }
  }
}
