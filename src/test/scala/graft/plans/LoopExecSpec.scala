package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The small-state loop-execution scope (round-20 optimization):
  * conf hygiene, the size gate, the derived partition count, and —
  * the part that matters — result invariance of a loop run under the
  * scope vs with it disabled. */
class LoopExecSpec extends SparkSpec {

  private val AqeKey = "spark.sql.adaptive.enabled"
  private val SpKey = "spark.sql.shuffle.partitions"

  test("scope sets AQE off + derived partitions inside, restores after") {
    val aqeBefore = spark.conf.getOption(AqeKey)
    val spBefore = spark.conf.get(SpKey)
    var insideAqe: String = null
    var insideSp: String = null
    LoopExec.withSmallLoopExec(spark, 1000L) {
      insideAqe = spark.conf.get(AqeKey)
      insideSp = spark.conf.get(SpKey)
    }
    assert(insideAqe == "false", "AQE must be off inside the scope")
    assert(insideSp == "1", "1k rows derive 1 partition")
    assert(spark.conf.getOption(AqeKey) == aqeBefore, "AQE conf restored")
    assert(spark.conf.get(SpKey) == spBefore, "shuffle partitions restored")
  }

  test("conf restored even when the body throws") {
    val spBefore = spark.conf.get(SpKey)
    intercept[RuntimeException] {
      LoopExec.withSmallLoopExec(spark, 1000L) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get(SpKey) == spBefore)
  }

  test("no-op above the smallRows threshold and when disabled") {
    val spBefore = spark.conf.get(SpKey)
    val aqeBefore = spark.conf.getOption(AqeKey)
    LoopExec.withSmallLoopExec(spark, LoopExec.DefaultSmallRows + 1) {
      assert(spark.conf.get(SpKey) == spBefore,
        "a big loop state must keep the session partitioning")
      assert(spark.conf.getOption(AqeKey) == aqeBefore,
        "a big loop state must keep the session AQE setting")
    }
    // unknown size (negative) = no-op
    LoopExec.withSmallLoopExec(spark, -1L) {
      assert(spark.conf.get(SpKey) == spBefore)
    }
    // kill switch
    spark.conf.set(LoopExec.EnabledKey, "false")
    try LoopExec.withSmallLoopExec(spark, 1000L) {
      assert(spark.conf.get(SpKey) == spBefore,
        s"${LoopExec.EnabledKey}=false must disable the scope")
    } finally spark.conf.unset(LoopExec.EnabledKey)
  }

  test("derivePartitions=false (the double-summing loops) keeps the " +
      "session partitioning, still disables AQE") {
    val spBefore = spark.conf.get(SpKey)
    LoopExec.withSmallLoopExec(spark, 1000L, derivePartitions = false) {
      assert(spark.conf.get(SpKey) == spBefore,
        "a double-summing loop must keep the session partition count — " +
          "reduce-count changes reorder FP accumulation (the " +
          "PageRankWarmSpec bit pin)")
      assert(spark.conf.get(AqeKey) == "false")
    }
    assert(spark.conf.get(SpKey) == spBefore)
  }

  test("derived partition count: size-proportional, capped at session") {
    assert(LoopExec.partitionsFor(spark, 1L) == 1)
    assert(LoopExec.partitionsFor(spark,
      LoopExec.DefaultRowsPerPartition + 1) == 2)
    // session cap (the spec session runs shuffle=4): a state that would
    // derive 6 partitions is clamped to the session's 4
    assert(LoopExec.partitionsFor(spark,
      6 * LoopExec.DefaultRowsPerPartition) == 4)
  }

  test("PageRank under the scope ≡ PageRank with the scope disabled " +
      "(bit-identical ranks)") {
    import spark.implicits._
    val pages = Seq("a", "b", "c", "d", "e").toDF("page")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"),
      ("a", "c"), ("e", "b")).toDF("src", "dst")
    def ranks(): Map[String, Double] =
      graft.graph.PageRank.run(pages, edges, iters = 4)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val scoped = ranks()
    spark.conf.set(LoopExec.EnabledKey, "false")
    val plain = try ranks() finally spark.conf.unset(LoopExec.EnabledKey)
    assert(scoped == plain,
      "the loop scope changed the computed ranks — it must only change " +
        "partitioning/planning, never values")
    // the redistribute branch (per-iteration eager checkpoints) too
    def ranksRedist(): Map[String, Double] =
      graft.graph.PageRank.run(pages, edges, iters = 3,
          redistributeDangling = true)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val scopedR = ranksRedist()
    spark.conf.set(LoopExec.EnabledKey, "false")
    val plainR = try ranksRedist() finally spark.conf.unset(LoopExec.EnabledKey)
    assert(scopedR == plainR)
  }
}
