package graft

import graft.queries.TextQueries

/** Closed-form checks of q_text_repetition's duplicate w-gram
  * fractions (and q_text_entropy's plumbing) over a temp documents
  * table — the same parquet path the gate reads. */
class TextRepetitionSpec extends SparkSpec {

  private lazy val dir: String = {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-docs").toString
    Seq(
      (0L, "a a a a"),        // 3×"a a" → dup2 = 2/3; 2×"a a a" → dup3 = 1/2
      (1L, "a b c d"),        // all w-grams distinct → 0.0
      (2L, "x"),              // shorter than any w-gram → 0.0
      (3L, "a b a b a"),      // 2-grams: ab,ba,ab,ba → dup2 = 1/2
      (4L, "")                // degenerate: split("") = [""] → 0.0
    ).map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("duplicate 2-gram and 3-gram fractions match hand computation") {
    val got = TextQueries.queries("q_text_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got(0L) == ((1.0 - 1.0 / 3.0, 0.5)))
    assert(got(1L) == ((0.0, 0.0)))
    assert(got(2L) == ((0.0, 0.0)))
    assert(got(3L) == ((0.5, 1.0 - 2.0 / 3.0)))
    assert(got(4L) == ((0.0, 0.0)))
  }

  test("entropy query runs over the same fixture with exact closed forms") {
    val got = TextQueries.queries("q_text_entropy")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(2L) == 0.0) // single char
    assert(got(4L) == 0.0) // empty
    // "a b c d": 7 code points, 'a'..'d' once each + ' ' three times:
    // log2(7) - (4·0 + 3·log2(3))/7
    val want = math.log(7.0) / math.log(2.0) -
      3.0 * (math.log(3.0) / math.log(2.0)) / 7.0
    assert(math.abs(got(1L) - want) < 1e-6)
  }
}
