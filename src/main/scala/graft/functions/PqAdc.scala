package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `pq_adc(qtab, codes)` — asymmetric-distance lookup sum for product
  * quantization: Σ_j qtab[j][codes[j]] over the M subspaces.
  *
  * Why a custom Catalyst Expression: this runs on the query × corpus
  * hot path (every corpus code row against every query's lookup
  * table); the built-in `aggregate(sequence(...), element_at(...))`
  * formulation is a higher-order function evaluated interpreted, which
  * measured ~5× slower and breaks whole-stage codegen around the join
  * ([[CosineSimilarity]] rationale). This compiles to a primitive loop
  * of M array lookups inside the fused stage.
  *
  * FP contract: accumulates in subspace index order — the same
  * sequential fold as the DuckDB oracle's `list_sum` comprehension, so
  * ADC values stay bit-identical.
  *
  * Semantics: null if either input is null; codes out of a table row's
  * range raise the standard invalid-index error (ANSI element_at
  * parity — encode and table construction share the same centroid
  * list, so a mismatch is a caller bug, not data).
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "pq_adc expects (array<array<double>>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(t: Any, c: Any): Any = {
    val tab = t.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    val m = math.min(tab.numElements(), codes.numElements())
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += tab.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = java.lang.Math.min($t.numElements(), $c.numElements());
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $t.getArray($j).getDouble($c.getInt($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
