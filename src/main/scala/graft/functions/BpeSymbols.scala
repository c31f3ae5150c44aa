package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge application for `q_text_tokens_bpe` / `q_text_pack`.
  *
  * Semantics (unchanged from the round-7 replace()-chain form, which
  * BpeSpec pins): every character becomes a symbol terminated by
  * [[BpeSymbolsUtil.Sep]], then the ordered merge table applies ONE
  * left-to-right non-overlapping pass per rule, in rank order — the
  * Sennrich'16 subword-nmt shape ("a a a" with rule (a,a) → "aa a").
  * Merges never cross whitespace: every whitespace character is its
  * own symbol and no trained rule contains one, so a pattern
  * (a·SEP·b·SEP, with a, b whitespace-free) can never span a
  * whitespace symbol — which makes per-word application equal to the
  * whole-string replace chain, and is what lets the memo below exist.
  *
  * Character contract: symbols start as UTF-16 code units (charAt),
  * which equals the oracle's regexp code-point split for all BMP text
  * — the corpus is ASCII; supplementary-plane input would diverge
  * (the same documented ASCII caveat as the editdist family). One
  * regex quirk is replicated exactly: the oracle's
  * `regexp_replace(text, '(.)', …)` init never terminates a NEWLINE
  * (RE2 `.` matches every char except `\n`), so `\n` stays an
  * unterminated non-symbol here too — it still breaks words (it is
  * whitespace) but contributes no token (code-review r9 finding:
  * the first charAt draft terminated it and diverged from the gate).
  *
  * Why a native expression (replacing the foldLeft-of-replace() column
  * from round 7): the merge table is now the TRAINED 1200-rule vocab
  * (resources/graft/bpe_merges.txt — VERDICT r8 item 5; the 30-rule
  * demo set lives on only as BpeSpec's closed-form fixture). A
  * 1200-deep nested replace() expression tree is hostile to Catalyst
  * (analysis cost, codegen size limits, 1200 string passes per ROW);
  * here the chain runs as a compiled loop per UNIQUE word via a
  * bounded memo — natural-language corpora repeat words, so the
  * steady state is one hash lookup per word.
  */
object BpeSymbolsUtil {

  /** Symbol terminator — a control char absent from the text corpus.
    * Each symbol is TERMINATED by it ("ab" → "a␁b␁"), so adjacent
    * merge sites never share a delimiter character. */
  val Sep = '\u0001'

  /** The production merge table: rank-ordered (a, b) pairs from the
    * shipped resource, trained by tools/train_bpe.py on the public
    * English prose in this container (common-licenses + Spark LICENSE/
    * NOTICE/README + Python stdlib docstrings — see the script
    * header). A data artifact, exactly like GPT-2's merges.txt: swap
    * the file to swap the vocab, no code change. */
  lazy val merges: IndexedSeq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing resource graft/bpe_merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(_.trim).filter(_.nonEmpty).map { line =>
      val i = line.indexOf(' ')
      require(i > 0 && i < line.length - 1,
        s"malformed merge rule in graft/bpe_merges.txt: '$line'")
      (line.substring(0, i), line.substring(i + 1))
    }.toVector
    finally src.close()
  }

  /** (search, replacement) strings per rule: a·SEP·b·SEP → ab·SEP. */
  private def compiled(ms: IndexedSeq[(String, String)]): IndexedSeq[(String, String)] =
    ms.map { case (a, b) => (s"$a$Sep$b$Sep", s"$a$b$Sep") }

  private lazy val productionRules = compiled(merges)

  // word → merged symbol string, for the production table only. Memo
  // is a pure-function cache: bounded in entries AND bytes (only words
  // ≤ 64 chars are memoized — covers all natural-language repetition;
  // base64/URL-shaped "words" are computed, not pinned, so a
  // pathological whitespace-free corpus cannot grow a process-lifetime
  // static map without bound — code-review r9), safe under concurrent
  // tasks (inserts stop at the cap, lookups continue).
  private val memoCap = 1 << 17
  private val memoMaxWordLen = 64
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // O(1) bound on memo entries: counts successful inserts instead of
  // calling ConcurrentHashMap.size (O(segments)) per miss. Overshoot is
  // bounded by the number of concurrent tasks (threads that all read
  // count < cap before any increments land), i.e. ≤ cap + 32 entries —
  // vs the old size<cap guard whose size() call was also O(segments).
  private val memoCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private def mergeWord(word: String,
      rules: IndexedSeq[(String, String)]): String = {
    val sb = new java.lang.StringBuilder(word.length * 2)
    var i = 0
    while (i < word.length) { sb.append(word.charAt(i)).append(Sep); i += 1 }
    var s = sb.toString
    var r = 0
    while (r < rules.length) {
      val (find, repl) = rules(r)
      if (s.contains(find)) s = s.replace(find, repl)
      r += 1
    }
    s
  }

  /** Apply an arbitrary merge table (tests: BpeSpec's closed-form
    * fixtures run the 30-rule demo set through this) — no memo. */
  private[graft] def applyMerges(text: String,
      ms: IndexedSeq[(String, String)]): String =
    applySplit(text, compiled(ms), useMemo = false)

  /** Production-table application, memoized per word. */
  def bpeSymbols(text: UTF8String): UTF8String =
    UTF8String.fromString(applySplit(text.toString, productionRules,
      useMemo = true))

  private def applySplit(text: String,
      rules: IndexedSeq[(String, String)], useMemo: Boolean): String = {
    val out = new java.lang.StringBuilder(text.length * 2)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\n') {
        // oracle parity: RE2 '.' skips newlines, so the init pass never
        // terminates them — a '\n' is a word break but not a symbol
        out.append(c)
        i += 1
      } else if (Character.isWhitespace(c)) {
        out.append(c).append(Sep)
        i += 1
      } else {
        var j = i
        while (j < text.length && !Character.isWhitespace(text.charAt(j)))
          j += 1
        val word = text.substring(i, j)
        val merged =
          if (useMemo && word.length <= memoMaxWordLen) {
            val hit = memo.get(word)
            if (hit != null) hit
            else {
              val m = mergeWord(word, rules)
              if (memoCount.get < memoCap &&
                  memo.putIfAbsent(word, m) == null)
                memoCount.incrementAndGet()
              m
            }
          } else mergeWord(word, rules)
        out.append(merged)
        i = j
      }
    }
    out.toString
  }
}

/** `bpe_symbols(text)` → string: the SEP-terminated BPE symbol string
  * of `text` under the shipped trained merge table. Token count =
  * number of SEP occurrences; md5 of the result pins every boundary. */
case class BpeSymbols(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_symbols expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_symbols"

  override def nullSafeEval(text: Any): Any =
    BpeSymbolsUtil.bpeSymbols(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeSymbolsUtil.bpeSymbols($c)")

  override protected def withNewChildInternal(c: Expression): BpeSymbols =
    copy(child = c)
}
