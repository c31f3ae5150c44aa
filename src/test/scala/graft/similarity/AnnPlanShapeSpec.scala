package graft.similarity

import graft.SparkSpec

/** Physical-plan regression guards for the ANN family: the scale
  * arguments (SURVEY §9, PLANS.md) rest on every query/probe/shortlist
  * side being BROADCAST against the corpus scan — if a future change
  * grows one of those sides past the broadcast threshold (or breaks
  * the equi-join form so Catalyst falls back to a cartesian product),
  * the query silently becomes a corpus-shuffling monster long before
  * the recall gate would notice. Pin the shape, not just the answer. */
class AnnPlanShapeSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"

  /** The no-SMJ assertions hold because the probe/shortlist sides fit
    * under autoBroadcastJoinThreshold — pin that conf (and AQE) for the
    * duration of the test so another suite tweaking session defaults
    * can't flip a join strategy and fail the guard without any real
    * plan regression (ADVICE r9). */
  private def withPinnedConfs[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANN plans: broadcast joins only — no sort-merge, no cartesian product") {
    withPinnedConfs {
      for (name <- Seq("q_ann_bruteforce", "q_ann_lsh", "q_ann_ivf",
          "q_ann_pq", "q_ann_ivfpq")) {
        val df = graft.SparkEntry.queries(name)(spark, Dir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("SortMergeJoin"),
          s"$name: a query/probe/shortlist side stopped broadcasting:\n" +
            plan.take(2000))
        assert(!plan.contains("CartesianProduct"),
          s"$name: an equi-join degenerated to a cartesian product:\n" +
            plan.take(2000))
      }
    }
  }

  test("q_ann_hybrid plan: equi-joined legs — no cartesian product") {
    withPinnedConfs {
      val df = graft.SparkEntry.queries("q_ann_hybrid")(spark, Dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the dense leg's query broadcast is a deliberate
      // BroadcastNestedLoopJoin (bounded query set × corpus scan);
      // everything else must stay equi-keyed. The fusion join is two
      // K-row-per-query lists — any join strategy is fine there, just
      // never a cartesian product.
      assert(!plan.contains("CartesianProduct"),
        s"q_ann_hybrid: a leg degenerated to a cartesian product:\n" +
          plan.take(2000))
      // the LEXICAL leg (checkpointed out of the fused plan): postings,
      // candidates and scoring are all equi-joins over the df-capped
      // inverted index — a CartesianProduct or non-equi BNLJ here means
      // the leg degenerated to all-pairs
      val lexPlan = graft.queries.SimilarityQueries
        .hybridLexical(spark, Dir, materialize = false)
        .queryExecution.sparkPlan.toString
      assert(!lexPlan.contains("CartesianProduct"),
        s"lexical leg degenerated to a cartesian product:\n" +
          lexPlan.take(2000))
      assert(!lexPlan.contains("BroadcastNestedLoopJoin"),
        s"lexical leg has a non-equi join:\n" + lexPlan.take(2000))
    }
  }

  test("q_ann_hybrid_stored plan: the dense leg reads the BUCKET-PRUNED " +
      "stored index — cell IN (probed) at the scan, no cartesian product") {
    withPinnedConfs {
      val df = graft.SparkEntry.queries("q_ann_hybrid_stored")(spark, Dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"q_ann_hybrid_stored: a leg degenerated to a cartesian " +
          s"product:\n${plan.take(2000)}")
      // the whole point of the gate (VERDICT r16 item 3): the dense
      // leg must be the SUBLINEAR stored path, not a corpus scan —
      // the probed-cell set filters the bucketed store AT the scan
      assert(plan.contains("In(cell") || plan.contains("cell#"),
        s"q_ann_hybrid_stored: the store's cell filter vanished:\n" +
          plan.take(2000))
      assert(plan.contains("SelectedBucketsCount"),
        s"q_ann_hybrid_stored: the stored-index scan stopped bucket-" +
          s"pruning — the dense leg reads the whole index:\n" +
          plan.take(2000))
    }
  }

  test("q_text_mixture plan: totals broadcast back, no sort-merge") {
    withPinnedConfs {
      val df = graft.SparkEntry.queries("q_text_mixture")(spark, Dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        "per-source totals must broadcast back to the corpus scan")
      assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    }
  }
}
