package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Lineage.freeLocalCheckpoint]] must actually release the RDD-level
  * blocks behind a localCheckpoint — the thing `Dataset.unpersist`
  * cannot do (it only clears the CacheManager entry). The convergence
  * loops (Components) rely on this to not leak one block set per round.
  */
class LineageSpec extends SparkSpec {

  test("freeLocalCheckpoint removes the checkpoint's persistent RDD") {
    val s = spark
    import s.implicits._
    val before = s.sparkContext.getPersistentRDDs.keySet
    val ck = (1 to 1000).toDF("x").withColumn("y", col("x") * 2)
      .localCheckpoint(eager = true)
    val added = s.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "eager localCheckpoint should persist an RDD")
    // Dataset.unpersist is documented-ineffective here: the blocks stay
    ck.unpersist(blocking = true)
    assert((s.sparkContext.getPersistentRDDs.keySet & added) == added)
    Lineage.freeLocalCheckpoint(ck)
    assert((s.sparkContext.getPersistentRDDs.keySet & added).isEmpty,
      "freeLocalCheckpoint should drop the internal RDD's blocks")
  }

  test("a cached DataFrame (no localCheckpoint) is left untouched") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).toDF("x").persist()
    df.count()
    val persisted = s.sparkContext.getPersistentRDDs.size
    Lineage.freeLocalCheckpoint(df) // no LogicalRDD leaf → no-op
    assert(s.sparkContext.getPersistentRDDs.size == persisted)
    df.unpersist(blocking = true)
  }
}
