package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the answer to "one hot key serializes the
  * whole join" at 100 TB (SURVEY.md §4.2: AQE handles skew). A join
  * with a planted hot key is executed under AQE with thresholds scaled
  * down to test size, and the spec asserts AQE actually split the
  * skewed partition (isSkew=true in the final plan). */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition") {
    val s = spark
    import s.implicits._
    val conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ (skew path)
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val old = conf.keys.map(k => k -> s.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // hot key 0 carries 100k rows; 99 cold keys carry 100 each.
      // NOTE: the assertion is on the bare join — AQE declines to split
      // a skewed join whose output partitioning is still needed by a
      // downstream aggregation (it would add a shuffle), so join+agg
      // plans keep the skew. That itself is a scale lesson: isolate the
      // skewed join from partitioning-sensitive consumers.
      val lhs = s.range(0, 100000).select(lit(0L).as("k"), col("id").as("v"))
        .unionAll(s.range(0, 9900)
          .select((col("id") % 99 + 1).as("k"), col("id").as("v")))
      val rhs = s.range(0, 100).select(col("id").as("k"),
        concat(lit("r"), col("id")).as("tag"))
      val j = lhs.join(rhs, "k")
      assert(j.collect().length == 109900)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
        s"expected AQE skew split in plan:\n${plan.take(4000)}")
    } finally old.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
