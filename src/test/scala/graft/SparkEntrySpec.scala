package graft

/** Driver-contract guardrails: every catalog query MUST have a DuckDB
  * oracle (a missing key silently downgrades the driver's check to
  * rows-only — this spec turns that into a red test instead), names
  * stay driver-parseable, and the flagship entry point returns rows.
  */
class SparkEntrySpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
    assert(q.nonEmpty)
  }

  test("query names are driver-safe identifiers") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("^q_[a-z0-9_]+$"), s"bad query name: $k")
    }
  }

  test("oracle SQL strings are non-empty and single-statement") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, k)
      assert(!sql.contains(";"), s"$k: multi-statement oracle")
    }
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
