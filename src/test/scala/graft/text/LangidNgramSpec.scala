package graft.text

import graft.SparkSpec
import graft.queries.TextQueries

/** `q_text_langid_ngram`'s rank-profile program on a CONSTRUCTED
  * corpus with real char-trigram signal — the driver corpus's lang
  * labels are synthetic noise, so algorithm sanity must be proven
  * here: distinct trigram distributions are recovered, mislabeled
  * docs are corrected toward their true script, and the result is
  * partitioning-invariant (exact integer program). */
class LangidNgramSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    def rep(unit: String) = (unit + " ") * 40 + unit
    val rows =
      // 4 cleanly-scripted training docs per language
      (1L to 4L).map(i => (i, "aa", rep("aba cab"))) ++
      (5L to 8L).map(i => (i, "zz", rep("zyz xyx"))) ++
      (9L to 12L).map(i => (i, "mm", rep("mnm omo"))) ++
      // mislabeled probes: text from one script, label from another
      Seq((100L, "zz", rep("aba cab")),
          (101L, "aa", rep("mnm omo")),
          (102L, "mm", rep("zyz xyx")))
    rows.toDF("doc_id", "lang", "text")
  }

  test("rank profiles recover the script, overriding a wrong label") {
    val out = TextQueries.langidNgram(corpus)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    (1L to 4L).foreach(i => assert(out(i) == "aa", s"train doc $i"))
    (5L to 8L).foreach(i => assert(out(i) == "zz", s"train doc $i"))
    (9L to 12L).foreach(i => assert(out(i) == "mm", s"train doc $i"))
    assert(out(100L) == "aa", "aba-script probe labeled zz must predict aa")
    assert(out(101L) == "mm", "mnm-script probe labeled aa must predict mm")
    assert(out(102L) == "zz", "zyz-script probe labeled mm must predict zz")
  }

  test("result is partitioning-invariant (exact integer program)") {
    val a = TextQueries.langidNgram(corpus)
      .orderBy("doc_id").collect().toSeq
    val b = TextQueries.langidNgram(corpus.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
