package graft.relational

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.RelationalQueries

/** `q_agg_inc_late` — LATE-ARRIVING DATA in MV maintenance (VERDICT
  * r19 gap 2): a row below the high-water mark arriving in a later
  * dump must not be lost. The fix is the dump definition — a dump is
  * an ARRIVAL set, not a key range — and for self-decomposable
  * aggregates merging the late partials is exact with no quarantine
  * (contrast the SCD2 family, where late data forces a
  * rebuild-from-full-log of affected users).
  *
  * Laws:
  *  1. LATE MERGE ≡ REBUILD — the arrival-based merge answers the
  *     full recompute row for row.
  *  2. TEETH — the late slice is non-empty and spans real groups,
  *     and the KEY-RANGE delta over the same late-excluding store is
  *     WRONG: it loses exactly the late rows (count deficit = the
  *     late count, and at least one group sum moves). Without this,
  *     law 1 would hold vacuously on a corpus with no late rows.
  *  3. COMMUTATIVITY — merge order does not matter: late-first then
  *     dump equals dump-first then late equals one combined merge
  *     (the reason MV needs no SCD-style quarantine).
  */
class AggLateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def thr = RelationalQueries.lineitemThreshold(spark, dir)

  private def li = Tables.lineitem(spark, dir)

  private def late = col("l_orderkey") < lit(thr) &&
    col("l_orderkey") % 97 === 13

  private def partials(f: org.apache.spark.sql.DataFrame) = f
    .groupBy(col("l_returnflag"), col("l_linestatus"))
    .agg(sum(col("l_quantity")).as("p_qty"),
      sum(col("l_extendedprice")).as("p_base"),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("p_disc"),
      count(lit(1)).as("p_n"))

  private def serve(merged: org.apache.spark.sql.DataFrame) = merged
    .groupBy(col("l_returnflag"), col("l_linestatus"))
    .agg(round(sum(col("p_qty")), 2).as("sum_qty"),
      round(sum(col("p_base")), 2).as("sum_base"),
      round(sum(col("p_disc")), 2).as("sum_disc_price"),
      sum(col("p_n")).as("n_rows"))
    .orderBy(col("l_returnflag"), col("l_linestatus"))

  test("arrival-based merge == full recompute, row for row") {
    val gate = SparkEntry.queries("q_agg_inc_late")(spark, dir).collect()
    val rebuild = SparkEntry.queries("q_agg_lineitem")(spark, dir).collect()
    assert(gate.toSeq == rebuild.toSeq,
      "merge(store-without-late, dump ∪ late) diverged from rebuild")
  }

  test("teeth: the late slice is non-empty and the key-range delta " +
      "loses exactly those rows") {
    val nLate = li.filter(late).count()
    assert(nLate > 0, "the late slice is empty — the law is vacuous " +
      "on this corpus; pick a rule the corpus exercises")
    val lateGroups = li.filter(late)
      .select("l_returnflag", "l_linestatus").distinct().count()
    assert(lateGroups >= 1)

    val store = partials(li.filter(col("l_orderkey") < lit(thr) && !late))
    // the round-19 bug, reconstructed: the delta stays the key range,
    // so the late rows are in NO leg — silently lost
    val keyRangeOnly =
      serve(store.unionByName(
        partials(li.filter(col("l_orderkey") >= lit(thr))))).collect()
    val rebuild = SparkEntry.queries("q_agg_lineitem")(spark, dir).collect()
    assert(keyRangeOnly.toSeq != rebuild.toSeq,
      "the key-range merge should be WRONG on a corpus with late " +
        "rows — if it matches, the teeth are gone")
    val deficit = rebuild.map(_.getLong(5)).sum -
      keyRangeOnly.map(_.getLong(5)).sum
    assert(deficit == nLate,
      s"the key-range merge lost $deficit rows, expected exactly " +
        s"the $nLate late rows")
  }

  test("commutativity: merge order does not matter (why MV needs no " +
      "SCD-style quarantine)") {
    val store = partials(li.filter(col("l_orderkey") < lit(thr) && !late))
    val dump = partials(li.filter(col("l_orderkey") >= lit(thr)))
    val lateP = partials(li.filter(late))
    val lateFirst = serve(store.unionByName(lateP).unionByName(dump))
      .collect()
    val dumpFirst = serve(store.unionByName(dump).unionByName(lateP))
      .collect()
    assert(lateFirst.toSeq == dumpFirst.toSeq,
      "sum/count partial merges stopped commuting — the no-quarantine " +
        "argument is void")
  }
}
