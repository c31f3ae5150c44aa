package graft

import org.apache.spark.sql.functions._

/** The scale path for repeated big⋈big joins: bucketed tables
  * co-located on the join key join WITHOUT a shuffle exchange — the
  * 100 TB answer to "this join shuffles both sides every query"
  * (SURVEY.md §7.4 / prompt's bucketing guidance). Asserted on the
  * physical plan, not vibes. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed co-located join runs with zero shuffle exchanges") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force SMJ path

    try {
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_customer")
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("b_orders")
      Tables.customer(s, dir).select("c_custkey", "c_name")
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("b_customer")

      val j = s.table("b_orders")
        .join(s.table("b_customer"), $"o_custkey" === $"c_custkey")
        .groupBy("c_custkey").agg(sum("o_totalprice").as("spend"))
      val n = j.count()
      assert(n > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      // control: the same join on plain (unbucketed) parquet DOES shuffle
      val plain = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
        .groupBy("c_custkey").agg(sum("o_totalprice"))
      plain.count()
      assert(plain.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
