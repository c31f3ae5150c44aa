package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native, codegen'd forms of the dedup sketch pipeline
  * ([[graft.dedup.Dedup]]'s SQL-expr builders compute identical values).
  *
  * Why these exist: Spark's higher-order functions (`transform`,
  * `aggregate`) are INTERPRETED — each lambda application walks an
  * expression tree per element, outside whole-stage codegen. The sketch
  * pipeline applies lambdas perms × |shingles| times per document, which
  * made the narrow signature pass the hottest part of the dedup suite
  * (measured ~2 s per stage at sf0.1 on 32 cores for 5 000 docs). These
  * expressions run the same loops as compiled JVM code invoked from
  * within whole-stage codegen — same results bit-for-bit, no interpreted
  * inner loop. The DuckDB oracles are unchanged: every hash is still
  * md5-derived ( hash32(s) = first 8 md5 hex digits as a long ), so both
  * engines replicate each other exactly.
  *
  * All loops live in [[ShingleHashUtil]] (plain compiled Scala); the
  * expressions' doGenCode emit a single static call, keeping the operator
  * inside the surrounding WholeStageCodegen span.
  */
object ShingleHashUtil {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // ---- single-block MD5 (RFC 1321) for short inputs -------------------
  // A shingle is a handful of bytes; MessageDigest pays per-call object
  // machinery (reset, buffering, a fresh 16-byte digest array) that
  // dominates the actual 64-round compression at that size. Inputs
  // ≤ 55 bytes fit one padded 64-byte block, and hash32 needs only the
  // first 4 digest bytes = the little-endian A word — so we run the 64
  // rounds directly and skip everything else. Verified bit-identical to
  // MessageDigest by ShingleHashesSpec's random-unicode property suite
  // and every md5-derived oracle gate.
  private val MdK: Array[Int] = Array.tabulate(64)(i =>
    ((math.abs(math.sin(i + 1.0)) * 4294967296.0).toLong & 0xffffffffL).toInt)
  private val MdS: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)
  private val blockLocal: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](16))

  /** Digest words A and B of the single-block md5 of
    * bytes[off, off+len) (len ≤ 55), packed big-endian:
    * (digest bytes 0-3 as unsigned) << 32 | (digest bytes 4-7 as
    * unsigned). [[hash32]] takes the high word; [[hash60]] the first
    * 15 nibbles. */
  private def md5AB(bytes: Array[Byte], off: Int, len: Int): Long = {
    val m = blockLocal.get()
    java.util.Arrays.fill(m, 0)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (bytes(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    m(len >> 2) |= 0x80 << ((len & 3) << 3) // 1-bit pad
    m(14) = len << 3 // bit length, low word (len ≤ 55 so high word = 0)
    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val x = a + f + MdK(i) + m(g)
      a = d
      d = c
      c = b
      b = b + Integer.rotateLeft(x, MdS(i))
      i += 1
    }
    // digest bytes 0..3 / 4..7 are the little-endian sum words A0+a,
    // B0+b; reverseBytes renders each in digest (big-endian hex) order
    ((Integer.reverseBytes(0x67452301 + a).toLong & 0xffffffffL) << 32) |
      (Integer.reverseBytes(0xefcdab89 + b).toLong & 0xffffffffL)
  }

  /** First 8 md5 hex digits of bytes[off, off+len), as an unsigned
    * 32-bit value in a long — bit-identical to Spark
    * `conv(substring(md5(s),1,8),16,10)` and DuckDB
    * `('0x'||substring(md5(s),1,8))::BIGINT`. */
  def hash32(bytes: Array[Byte], off: Int, len: Int): Long = {
    if (len > 55) { // multi-block: delegate to MessageDigest
      val md = mdLocal.get()
      md.reset()
      md.update(bytes, off, len)
      val d = md.digest()
      return ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    md5AB(bytes, off, len) >>> 32
  }

  /** First 15 md5 hex digits of bytes[off, off+len) as an unsigned
    * 60-bit value — bit-identical to Spark
    * `conv(substring(md5(s),1,15),16,10)` and DuckDB
    * `('0x'||substring(md5(s),1,15))::BIGINT` (the 8-byte join-key
    * form the allpairs/decontaminate families shuffle). */
  def hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    if (len > 55) { // multi-block: delegate to MessageDigest
      val md = mdLocal.get()
      md.reset()
      md.update(bytes, off, len)
      val d = md.digest()
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      return (v << 4) | ((d(7) & 0xffL) >>> 4)
    }
    val ab = md5AB(bytes, off, len)
    ((ab >>> 32) << 28) | ((ab & 0xffffffffL) >>> 4)
  }

  def hash32(bytes: Array[Byte]): Long = hash32(bytes, 0, bytes.length)

  /** Sort + dedupe (adjacent) a hash buffer of length `n` → ArrayData.
    * Matches `array_sort(array_distinct(hashes))`: distinct-by-string
    * before hashing and distinct-by-hash after produce the same SET of
    * hash values, and the sort fixes the order. */
  private def sortedDistinct(buf: Array[Long], n: Int): ArrayData = {
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    java.util.Arrays.sort(buf, 0, n)
    var w = 1
    var i = 1
    while (i < n) {
      if (buf(i) != buf(w - 1)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, w))
  }

  /** Distinct sorted hash32 of word w-gram shingles (shingle = w
    * consecutive tokens joined by ' ', concat_ws semantics: null tokens
    * skipped). Inputs shorter than w tokens → empty array. */
  /** hash60 of ALL word k-gram join-keys IN ORDER, duplicates kept —
    * the positional 60-bit stream the allpairs tf pass and the
    * decontamination window pass consume (their `groupBy` needs the
    * multiplicities [[wordShingleHashes]]'s sorted-distinct sketch
    * destroys). Exactly
    * `transform(<ordered k-grams>, g -> conv(substring(md5(g),1,15),16,10))`
    * with grams = `concat_ws(' ', slice(toks, i, k))` (nulls skipped,
    * the concat_ws rule), as one compiled loop. Fewer than k tokens →
    * empty. */
  def wordGramHashes60(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) tokBytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    var sb = new Array[Byte](64)
    i = 0
    while (i < out.length) {
      var len = 0
      var j = 0
      var parts = 0
      while (j < k) { // concat_ws(' ', ...) skips nulls
        val tb = tokBytes(i + j)
        if (tb != null) { len += tb.length + (if (parts > 0) 1 else 0); parts += 1 }
        j += 1
      }
      if (sb.length < len) sb = new Array[Byte](len)
      var off = 0
      j = 0; parts = 0
      while (j < k) {
        val tb = tokBytes(i + j)
        if (tb != null) {
          if (parts > 0) { sb(off) = ' '; off += 1 }
          System.arraycopy(tb, 0, sb, off, tb.length); off += tb.length
          parts += 1
        }
        j += 1
      }
      out(i) = hash60(sb, 0, len)
      i += 1
    }
    new GenericArrayData(out)
  }

  def wordShingleHashes(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) tokBytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val nShingles = n - w + 1
    val seen = new java.util.HashSet[UTF8String](nShingles * 2)
    val hashes = new Array[Long](nShingles)
    var nh = 0
    i = 0
    while (i < nShingles) {
      var len = 0
      var j = 0
      var parts = 0
      while (j < w) { // concat_ws(' ', ...) skips nulls
        val tb = tokBytes(i + j)
        if (tb != null) { len += tb.length + (if (parts > 0) 1 else 0); parts += 1 }
        j += 1
      }
      val sb = new Array[Byte](len)
      var off = 0
      j = 0; parts = 0
      while (j < w) {
        val tb = tokBytes(i + j)
        if (tb != null) {
          if (parts > 0) { sb(off) = ' '; off += 1 }
          System.arraycopy(tb, 0, sb, off, tb.length); off += tb.length
          parts += 1
        }
        j += 1
      }
      val s = UTF8String.fromBytes(sb)
      if (seen.add(s)) { hashes(nh) = hash32(sb); nh += 1 }
      i += 1
    }
    sortedDistinct(hashes, nh)
  }

  /** ALL character k-grams IN ORDER, duplicates kept — the gram stream
    * a count-based model consumes (Cavnar-Trenkle language ID), vs
    * [[charShingleHashes]]'s sorted-distinct hash sketch. Exactly
    * `transform(sequence(1, length(t)-k+1), i -> substring(t, i, k))`
    * (character semantics, matching Spark/DuckDB `substring`), but as
    * one compiled loop instead of an interpreted per-element lambda —
    * the same interpreted-HOF trade documented on the object scaladoc,
    * which made the gram explode the engine's slowest text stage.
    * Texts shorter than k chars → empty array. One `getBytes` + one
    * boundary walk; each gram is an (offset, len) view of the shared
    * byte array. */
  def charGrams(text: UTF8String, k: Int): ArrayData = {
    val n = text.numChars()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val bytes = text.getBytes
    val starts = new Array[Int](n + 1) // byte offset of each char
    var i = 0
    var off = 0
    while (i < n) {
      starts(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    starts(n) = bytes.length
    val out = new Array[AnyRef](n - k + 1)
    i = 0
    while (i < out.length) {
      val o = starts(i)
      out(i) = UTF8String.fromBytes(bytes, o, starts(i + k) - o)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** hash32 of ALL character k-grams IN ORDER, duplicates kept — the
    * positional hash stream winnowing slides its window over (vs
    * [[charShingleHashes]]'s sorted-distinct sketch, which destroys
    * the positions winnowing needs). Exactly
    * `transform(<ordered k-grams>, s -> hash32(s))`
    * (TextFunctions.shingleHashesExpr) as one compiled loop; texts
    * shorter than k chars → empty. Same zero-copy (offset, len)
    * hashing as the sketch form. */
  def charGramHashes(text: UTF8String, k: Int): ArrayData = {
    val n = text.numChars()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val bytes = text.getBytes
    val starts = new Array[Int](n + 1)
    var i = 0
    var off = 0
    while (i < n) {
      starts(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    starts(n) = bytes.length
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i < out.length) {
      out(i) = hash32(bytes, starts(i), starts(i + k) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint selection (Schleimer'03) over an ORDERED
    * hash stream: per-window (width `w`) minima, deduplicated keeping
    * FIRST occurrence order — exactly
    * `array_distinct(transform(sequence(1, n-w+1), i -> array_min(slice(hs, i, w))))`
    * (TextFunctions.winnowExpr) as one compiled loop. Streams shorter
    * than w → empty. O(n·w) scan (w is a small constant, 4 in the
    * gates); the dedup set is bounded by the output (~2n/(w+1)). */
  def winnow(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](n)
    val out = new Array[Long](n - w + 1)
    var nOut = 0
    var i = 0
    while (i <= n - w) {
      var m = hashes.getLong(i)
      var j = i + 1
      while (j < i + w) {
        val v = hashes.getLong(j)
        if (v < m) m = v
        j += 1
      }
      if (seen.add(m)) { out(nOut) = m; nOut += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  /** Distinct sorted hash32 of character k-gram shingles (character
    * semantics, matching Spark/DuckDB `substring`). Texts shorter than
    * k chars → empty array. Zero-copy: one `getBytes` per document, a
    * UTF-8 char-boundary walk, then every shingle is an (offset, len)
    * window hashed in place — no per-shingle substring allocation (the
    * dedup HashSet wraps the shared array via `UTF8String.fromBytes`).
    */
  def charShingleHashes(text: UTF8String, k: Int): ArrayData = {
    val n = text.numChars()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val bytes = text.getBytes
    val starts = new Array[Int](n + 1) // byte offset of each char
    var i = 0
    var off = 0
    while (i < n) {
      starts(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    starts(n) = bytes.length
    val nShingles = n - k + 1
    val seen = new java.util.HashSet[UTF8String](nShingles * 2)
    val hashes = new Array[Long](nShingles)
    var nh = 0
    i = 0
    while (i < nShingles) {
      val o = starts(i)
      val l = starts(i + k) - o
      if (seen.add(UTF8String.fromBytes(bytes, o, l))) {
        hashes(nh) = hash32(bytes, o, l)
        nh += 1
      }
      i += 1
    }
    sortedDistinct(hashes, nh)
  }

  /** MinHash signature over a hash32 array via the affine universal-hash
    * family: sig[i] = min_h ((2i+1)·h + (i·2654435761) mod 2³²) mod 2³².
    * Identical arithmetic to [[graft.dedup.Dedup.minhashExpr]] (all
    * operands < 2⁶³, no overflow). Returns null for empty input. */
  def minhashSig(hashes: ArrayData, perms: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val sig = new Array[Long](perms)
    var i = 0
    while (i < perms) {
      val a = 2L * i + 1
      val b = (i * 2654435761L) % 4294967296L
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * hashes.getLong(j) + b) % 4294967296L
        if (v < best) best = v
        j += 1
      }
      sig(i) = best
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 32-bit SimHash (Charikar'02) over the tokens' hash32 values —
    * term-frequency weighted (every occurrence votes). Identical to
    * [[graft.dedup.Dedup.simhashExpr]] ∘ tokenHashesExpr. */
  def simhash32(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = hash32(toks.getUTF8String(i).getBytes)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

/** `word_shingle_hashes(tokens, w)` → sorted distinct `array<bigint>`
  * of md5-hash32 word w-gram shingles. */
case class WordShingleHashes(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"shingle width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(toks: Any): Any =
    ShingleHashUtil.wordShingleHashes(toks.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.wordShingleHashes($c, $w)")

  override protected def withNewChildInternal(c: Expression): WordShingleHashes =
    copy(child = c)
}

/** `char_grams(text, k)` → `array<string>` of ALL character k-grams in
  * order, duplicates kept (the count-preserving gram stream; cited
  * semantics on [[ShingleHashUtil.charGrams]]). */
case class CharGrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"gram width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_grams expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def nullSafeEval(text: Any): Any =
    ShingleHashUtil.charGrams(text.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.charGrams($c, $k)")

  override protected def withNewChildInternal(c: Expression): CharGrams =
    copy(child = c)
}

/** `char_gram_hashes(text, k)` → `array<bigint>` hash32 of ALL
  * character k-grams in order, duplicates kept (the positional stream
  * winnowing consumes; semantics on [[ShingleHashUtil.charGramHashes]]). */
case class CharGramHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"gram width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override def nullSafeEval(text: Any): Any =
    ShingleHashUtil.charGramHashes(text.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.charGramHashes($c, $k)")

  override protected def withNewChildInternal(c: Expression): CharGramHashes =
    copy(child = c)
}

/** `word_gram_hashes60(toks, k)` → `array<bigint>` hash60 of all word
  * k-gram join-keys in order, duplicates kept (semantics on
  * [[ShingleHashUtil.wordGramHashes60]]). */
case class WordGramHashes60(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"gram width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_gram_hashes60 expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_hashes60"

  override def nullSafeEval(toks: Any): Any =
    ShingleHashUtil.wordGramHashes60(toks.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.wordGramHashes60($c, $k)")

  override protected def withNewChildInternal(c: Expression): WordGramHashes60 =
    copy(child = c)
}

/** `winnow(hashes, w)` → `array<bigint>` first-occurrence-ordered
  * distinct per-window minima (Schleimer'03 fingerprint selection;
  * semantics on [[ShingleHashUtil.winnow]]). */
case class Winnow(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      // getLong on a null slot would silently read 0 — and 0 wins every
      // window minimum, fabricating a fingerprint; reject at analysis
      "winnow expects array<bigint> with non-null elements " +
        "(wrap with filter(x, h -> h is not null) first)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override def nullSafeEval(hashes: Any): Any =
    ShingleHashUtil.winnow(hashes.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.winnow($c, $w)")

  override protected def withNewChildInternal(c: Expression): Winnow =
    copy(child = c)
}

/** `char_shingle_hashes(text, k)` → sorted distinct `array<bigint>` of
  * md5-hash32 character k-gram shingles. */
case class CharShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingle_hashes expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_shingle_hashes"

  override def nullSafeEval(text: Any): Any =
    ShingleHashUtil.charShingleHashes(text.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.charShingleHashes($c, $k)")

  override protected def withNewChildInternal(c: Expression): CharShingleHashes =
    copy(child = c)
}

/** `minhash_sig(hashes, perms)` → `array<bigint>` MinHash signature;
  * null for empty/null input (nothing to sketch). */
case class MinHashSig(child: Expression, perms: Int)
    extends UnaryExpression {
  require(perms >= 1, s"perms must be >= 1, got $perms")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(hashes: Any): Any =
    ShingleHashUtil.minhashSig(hashes.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.ShingleHashUtil.minhashSig($c, $perms);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** `simhash32(tokens)` → 32-bit TF-weighted SimHash as a long. */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(toks: Any): Any =
    ShingleHashUtil.simhash32(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.simhash32($c)")

  override protected def withNewChildInternal(c: Expression): SimHash32 =
    copy(child = c)
}
