package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Registration of graft's native Catalyst expressions.
  *
  * Two paths to the same registry entry:
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build
  *     (the SparkSessionExtensions injection point), or
  *   - [[GraftFunctions.register]] on a live session (used by the
  *     query catalog so the driver's plain sessions get the functions
  *     without special configs).
  *
  * After either, `cosine_sim(a, b)` is available to SQL, and to the
  * DataFrame API via `call_function("cosine_sim", …)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.cosineSimEntry)
}

object GraftFunctions {

  private[graft] val cosineSimEntry
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_sim expects exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    }
  )

  /** Idempotent registration on a live session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = cosineSimEntry
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
