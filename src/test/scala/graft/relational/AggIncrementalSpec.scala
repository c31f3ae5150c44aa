package graft.relational

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.RelationalQueries

/** `q_agg_incremental` — incremental materialized-view maintenance:
  * a persisted standing partial-agg table + a range-pruned delta agg,
  * merged at serve.
  *
  * Laws:
  *  1. MV LAW — the maintained serve equals full recomputation
  *     (q_agg_lineitem) row for row, both engine paths.
  *  2. TEETH — the delta is non-empty and genuinely moves at least one
  *     group's totals vs serving the store alone (a vacuous dump would
  *     make the merge untested).
  *  3. PLAN — the serve's lineitem scan pushes the order-key range
  *     filter to parquet (the standing corpus's bytes are never
  *     re-read) and the plan reads the persisted store table.
  */
class AggIncrementalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("maintained serve == full recompute, row for row") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toSeq).toSeq
    val inc = rows("q_agg_incremental")
    val full = rows("q_agg_lineitem")
    assert(inc.nonEmpty)
    assert(inc == full,
      s"incremental maintenance diverged from recompute:\n$inc\nvs\n$full")
  }

  test("the dump has teeth: delta non-empty, totals move") {
    val thr = RelationalQueries.lineitemThreshold(spark, dir)
    val nDelta = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") >= lit(thr)).count()
    assert(nDelta > 0, "empty delta — the merge path is vacuous")
    val storeOnly = RelationalQueries.aggStore(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("p_n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val served = SparkEntry.queries("q_agg_incremental")(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(served.exists { case (k, n) => storeOnly.get(k) != Some(n) },
      "no group's count moved — the dump touched nothing")
  }

  test("rounding-boundary margin: every unrounded group sum sits far " +
      "from a 0.005 boundary relative to the merge-reorder drift " +
      "(ADVICE r17 — the one-oracle law's float contract, measured)") {
    val thr = RelationalQueries.lineitemThreshold(spark, dir)
    def partials(f: org.apache.spark.sql.DataFrame) = f
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("p_qty"),
        sum(col("l_extendedprice")).as("p_base"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("p_disc"))
    val li = Tables.lineitem(spark, dir)
    // merge path: store partials + delta partials, summed per group
    val merged = RelationalQueries.aggStore(spark, dir)
      .select("l_returnflag", "l_linestatus", "p_qty", "p_base", "p_disc")
      .unionByName(partials(li.filter(col("l_orderkey") >= lit(thr))))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("p_qty").as("p_qty"), sum("p_base").as("p_base"),
        sum("p_disc").as("p_disc"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val full = partials(li).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(merged.keySet == full.keySet)
    // observed reorder drift vs distance to the nearest round(_, 2)
    // decision boundary (k + 0.005 grid): the law is robust iff every
    // sum clears the boundary by far more than the drift
    val (drifts, margins) = merged.toSeq.flatMap { case (k, ms) =>
      ms.zip(full(k)).map { case (a, b) =>
        val frac = math.abs(a * 100 - math.floor(a * 100) - 0.5) / 100
        (math.abs(a - b), frac)
      }
    }.unzip
    val maxDrift = drifts.max
    val minMargin = margins.min
    info(f"max merge-vs-recompute drift = $maxDrift%.3e, " +
      f"min 0.005-boundary distance = $minMargin%.3e")
    // 50× the observed drift plus an absolute floor (measured at
    // sf0.01: margin 1.0e-4 vs drift 6.6e-7 — a ~155× ratio)
    assert(minMargin > 1e-5 &&
        minMargin > 50 * math.max(maxDrift, 1e-12),
      f"a group sum sits within ~the reorder error of a rounding " +
        f"boundary (margin $minMargin%.3e vs drift $maxDrift%.3e) — " +
        "the one-oracle 2-dp contract is no longer safe on this " +
        "corpus; move the MV partials to DECIMAL on both engines")
  }

  test("the margin guard itself has teeth: an adversarial sum ON a " +
      "0.005 boundary is flagged (VERDICT r18 item 8 — prove the " +
      "spec fails loudly there, not that the corpus is lucky)") {
    // a group whose quantity sum lands (to within double error) on a
    // k + 0.005 rounding boundary: 0.335 * 3 = 1.005. The margin
    // formula the corpus test enforces must measure ~0 here — i.e.
    // the whole-family DECIMAL remedy would be demanded.
    import spark.implicits._
    val sums = Seq(("A", 0.335), ("A", 0.335), ("A", 0.335))
      .toDF("l_returnflag", "l_quantity")
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      .collect().map(_.getDouble(1))
    val margins = sums.map { a =>
      math.abs(a * 100 - math.floor(a * 100) - 0.5) / 100
    }
    assert(margins.min < 1e-5,
      f"the adversarial boundary fixture was NOT flagged (margin " +
        f"${margins.min}%.3e) — the guard formula is broken and the " +
        "corpus margin test above is not protecting the 2-dp contract")
  }

  test("plan: delta scan pushes the range filter; store table read") {
    val df = SparkEntry.queries("q_agg_incremental")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_agg_store_"),
      s"serve does not read the persisted MV:\n${plan.take(2000)}")
    assert(plan.contains("GreaterThanOrEqual(l_orderkey"),
      s"the delta range predicate was not pushed to the scan:\n" +
        plan.take(2000))
  }
}
