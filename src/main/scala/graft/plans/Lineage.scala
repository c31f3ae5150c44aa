package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-store hygiene for iterative loops that truncate lineage with
  * `localCheckpoint(eager = true)` per round.
  *
  * `Dataset.unpersist` only clears the CacheManager's InMemoryRelation
  * entry — it cannot reach the RDD-level blocks a localCheckpoint
  * stores (they belong to the internal RDD captured by the resulting
  * plan's [[LogicalRDD]] leaf). A convergence loop that re-checkpoints
  * per round therefore leaks one vertex- or edge-sized block set per
  * round until the ContextCleaner happens to collect the RDD — in a
  * long session (or a bench run) those stack up and tax every query
  * that follows with eviction and GC pressure.
  */
object Lineage {

  /** Free the block-store storage behind a localCheckpoint'ed Dataset.
    *
    * DESTRUCTIVE: the RDD's lineage was truncated at checkpoint time,
    * so after this call the Dataset can never be computed again — only
    * call it once every consumer of `df` has materialized.
    */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
