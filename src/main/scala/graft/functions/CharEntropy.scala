package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of a document's character distribution — the cheap
  * "is this natural text or noise" quality signal of LLM data pipelines
  * (low entropy → boilerplate/repeated filler; implausibly high →
  * random/binary junk). One pass per document, codegen-friendly like
  * the [[ShingleHashUtil]] family: the loop is plain compiled Scala
  * invoked from within WholeStageCodegen.
  *
  * Determinism contract with the DuckDB oracle: counts are per CODE
  * POINT, the Σ c·log₂(c) fold runs in ascending code-point order
  * (DuckDB: `list(c ORDER BY ch)` then an in-order `list_sum` — UTF-8
  * byte order equals code-point order), and log₂ is computed as
  * ln(x)/ln(2) on both engines so the only cross-engine wiggle is the
  * libm ln() call itself — absorbed by the gate's round(…, 6).
  */
object CharEntropyUtil {

  private val Ln2 = math.log(2.0)

  /** entropy(text) = log₂(n) − (Σ_ch c_ch · log₂(c_ch)) / n over the
    * code-point histogram; 0.0 for empty input (and exactly 0.0 for
    * single-character runs: log₂(n) − n·log₂(n)/n cancels bitwise). */
  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    // ascending-code-point histogram: the fold order is part of the
    // cross-engine contract, so a sorted map, not a hash map
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1L
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      acc += c * (math.log(c) / Ln2)
    }
    val nd = n.toDouble
    math.log(nd) / Ln2 - acc / nd
  }
}

/** `char_entropy(text)` → double: Shannon entropy (bits/char) of the
  * code-point distribution. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(text: Any): Any =
    CharEntropyUtil.charEntropy(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropyUtil.charEntropy($c)")

  override protected def withNewChildInternal(c: Expression): CharEntropy =
    copy(child = c)
}
