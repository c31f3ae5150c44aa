package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(bloom, h)` → boolean: membership probe of a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] against a
  * long key. False positives possible (callers verify candidates with
  * an exact join); false negatives impossible — that asymmetry is the
  * whole contract.
  *
  * Role at 100 TB: the decontamination / blocklist prefilter. A
  * benchmark-gram (or URL/doc-id blocklist) set too large to broadcast
  * as rows still fits as a bloom — ~1.2 MB per million keys at 1% fpp —
  * so the corpus-side scan drops all-but-(matches + fpp·N) rows BEFORE
  * any shuffle, and the exact verify join only ever sees that sliver.
  * Same shape as Catalyst's own runtime-filter probe
  * (InjectRuntimeFilter / BloomFilterMightContain, Spark 3.3+), built
  * here on the public sketch API with an explicit, caller-built filter:
  * the build side of OUR filter is a whole aggregation pipeline
  * (explode → hash → distinct), not the join-key scan the optimizer's
  * injected rule covers.
  *
  * The filter argument must be a FOLDABLE non-null binary (a literal
  * produced by `df.stat.bloomFilter(...)` — itself a distributed
  * treeAggregate; only the ~MB sketch ever reaches the driver). It is
  * deserialized once per task via a codegen reference object — never
  * per row — and probes stay inside WholeStageCodegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if !left.foldable =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain's filter argument must be foldable (a " +
            "serialized bloom literal) — it is deserialized once per task")
      case (BinaryType, LongType) if left.eval() == null =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain's filter argument must not be null")
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  /** Deserialized once per JVM-side instance: the expression travels
    * inside the serialized plan, so each task's first probe pays the
    * one readFrom and every later row is a pure bit-test. */
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(left.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(bloomBytes: Any, h: Any): Any =
    filter.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev,
      (_, h) => s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
