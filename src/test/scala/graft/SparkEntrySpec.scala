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

  /** VERDICT r11 item 4: the round-11 data-contract flip broke 14 catalog
    * queries at ANALYSIS time and `sbt test` only noticed by accident
    * (SqlSurfaceSpec happened to register the events view). This runs the
    * ENTIRE catalog against the live driver testdata, so any query that
    * throws — analysis error, broken read, streaming gate — turns the
    * build red with its name attached, not via an incidental hit. */
  test("every catalog query constructs and runs at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val r =
          try { fn(spark, dir).count(); None }
          catch { case e: Throwable =>
            Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(2).mkString(" ")}")
          }
        // free per-query scratch checkpoints: 97 queries in one test JVM
        // otherwise accumulate dead block sets (same hygiene as Verify)
        graft.plans.Lineage.freeScratch(spark)
        r
    }
    assert(failures.isEmpty,
      s"${failures.size} catalog queries failed:\n${failures.mkString("\n")}")
  }
}
