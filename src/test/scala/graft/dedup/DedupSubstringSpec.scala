package graft.dedup

import graft.SparkSpec
import graft.queries.DedupQueries

/** Closed-form checks of the exact-substring (duplicated word-w-gram
  * window) statistics behind q_dedup_substring. */
class DedupSubstringSpec extends SparkSpec {

  private def stats(docs: Seq[(Long, String)], w: Int) = {
    import spark.implicits._
    DedupQueries.substringDupStats(docs.toDF("doc_id", "text"), w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("a shared 8-token run marks exactly its windows in both docs") {
    val shared = "a b c d e f g h" // exactly one 8-gram
    val out = stats(Seq(
      1L -> s"$shared x y z",   // 4 windows, 1 duplicated
      2L -> s"p q r $shared",   // 4 windows, 1 duplicated
      3L -> "k l m n o u v w"), w = 8) // 1 window, unique
    assert(out(1L) == ((4L, 1L, 0.25)))
    assert(out(2L) == ((4L, 1L, 0.25)))
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  test("a window repeated WITHIN one document counts as duplicated") {
    // tokens: the 3-gram "a b c" occurs at positions 1 and 4
    val out = stats(Seq(10L -> "a b c a b c"), w = 3)
    // windows: abc, bca, cab, abc → 4 windows, the two abc are dups
    assert(out(10L) == ((4L, 2L, 0.5)))
  }

  test("documents shorter than the window emit zero windows, not rows lost") {
    val out = stats(Seq(5L -> "only three tokens", 6L -> "a b c d"), w = 4)
    assert(out(5L) == ((0L, 0L, 0.0)))
    assert(out(6L) == ((1L, 0L, 0.0)))
  }

  test("byte-identical documents are fully duplicated windows") {
    val text = "one two three four five six seven eight nine"
    val out = stats(Seq(1L -> text, 2L -> text), w = 8)
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 2L, 1.0)))
  }
}
