package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeSymbolsUtil

/** q_text_tokens_bpe: ordered-merge application hand-checked against a
  * closed-form 30-rule fixture table (the round-7 demo set — the
  * production table is the trained 1200-rule resource, checked for its
  * own invariants below; fixtures stay pinned to an explicit table so
  * retraining the vocab can't orphan them, the PqSpec lesson). */
class BpeSpec extends SparkSpec {

  /** English-digraph fixture with deliberate chaining: "th"+"e",
    * "an"+"d", "th"+"at" reference EARLIER merges' outputs. */
  private val fixture: IndexedSeq[(String, String)] = Vector(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "an" -> "d", "o" -> "n", "r" -> "e", "e" -> "n", "a" -> "t",
    "e" -> "s", "o" -> "r", "s" -> "t", "a" -> "r", "o" -> "u",
    "l" -> "l", "e" -> "d", "in" -> "g", "t" -> "o", "i" -> "s",
    "o" -> "f", "h" -> "e", "a" -> "s", "s" -> "e", "th" -> "at",
    "ou" -> "r", "er" -> "s", "c" -> "h", "l" -> "e", "d" -> "e")

  private def nTokens(text: String, ms: IndexedSeq[(String, String)]): Int =
    BpeSymbolsUtil.applyMerges(text, ms)
      .count(_ == BpeSymbolsUtil.Sep)

  test("BPE merge chain: rank order, earlier-merge references, whitespace isolation") {
    // "the cat": t+h→th, th+e→the (rule 2 references rule 1's output);
    // c+a stays (no rule), a+t→at → tokens: the, ' ', c, at = 4
    assert(nTokens("the cat", fixture) === 4)
    // "that is": th→th, a+t→at, th+at→that (rule 25 references both);
    // i+s→is → tokens: that, ' ', is = 3
    assert(nTokens("that is", fixture) === 3)
    assert(nTokens("a", fixture) === 1)
    assert(nTokens("", fixture) === 0)
    // one pass per rule, left-to-right non-overlapping: "a a a" with a
    // single (a, a)-style rule never cascades — spot-check with "ttt"
    // under (t, t): tt + t, not ttt
    assert(nTokens("ttt", Vector("t" -> "t")) === 2)
    // oracle regex parity: RE2 '.' skips '\n', so a newline is a word
    // break but NOT a symbol — 'a', '\n' (no token), 'a' = 2 tokens
    // (code-review r9: the first charAt split terminated it and
    // diverged from the DuckDB gate)
    assert(nTokens("a\na", fixture) === 2)
    // space IS a symbol: 'a', ' ', 'a' = 3
    assert(nTokens("a a", fixture) === 3)
  }

  test("production merge table is the trained >=1k-rule vocab") {
    val ms = BpeSymbolsUtil.merges
    assert(ms.size >= 1000, s"expected a real trained vocab, got ${ms.size} rules")
    // trained rules chain (later rules consume earlier merges' outputs)
    assert(ms.exists { case (a, b) => a.length > 1 || b.length > 1 })
    // the whitespace invariant the per-word application relies on
    assert(ms.forall { case (a, b) =>
      !(a + b).exists(Character.isWhitespace) })
    // structurally well-formed rules (no artifact-specific pins: the
    // vocab is swappable data, retraining must not break the suite)
    assert(ms.forall { case (a, b) => a.nonEmpty && b.nonEmpty })
  }

  test("q_text_tokens_bpe on the production table: counts compress real text") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the cat"), (2L, "that is the end"), (3L, "a"),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = queries.TextQueries.queries("q_text_tokens_bpe")(s, writeDocs(df))
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
    // trained table contains th/the: "the cat" must compress below its
    // 7 chars but stay at least the 2-word floor
    assert(out(1L) >= 2L && out(1L) < 7L)
    assert(out(2L) >= 4L && out(2L) < 15L)
    assert(out(3L) === 1L)
    assert(out(4L) === 0L)
  }

  private def writeDocs(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    df.withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
}
