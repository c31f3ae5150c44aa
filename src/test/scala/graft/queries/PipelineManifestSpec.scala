package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** `q_pipeline_manifest` / [[PipelineCommit]] — the cross-family
  * commit point (VERDICT r18 item 3), reworked in round 20 to the
  * production shape (VERDICT r19 items 1+4, ADVICE r19 item 4): ONE
  * generation-keyed manifest table written APPEND-ONLY, a
  * `__commit__` sentinel row making each generation's visibility
  * atomic at job commit, and every family serve resolving its store
  * THROUGH the committed pointer.
  *
  * Laws:
  *  1. CONSISTENCY — one committed pass registers all seven families
  *     at the SAME generation, each resolving to an existing table.
  *  2. ABORTED PASS IS INVISIBLE — store writes without a publish
  *     change nothing a reader resolves.
  *  3. RE-PUBLISH KEEPS THE PREVIOUS SNAPSHOT — committing
  *     generation N+1 never drops or rewrites generation N's rows
  *     (the round-19 DROP+overwrite publish lost the WHOLE manifest
  *     to a crash between the drop and the write; append-only closes
  *     that window by construction).
  *  4. COMMITTED GENERATIONS ARE IMMUTABLE — re-publishing a
  *     generation with identical content is a no-op; with different
  *     content it is refused loudly.
  *  5. NO DANGLING POINTERS — publishing a generation naming a
  *     missing table is refused, and the refusal appends nothing.
  *  6. THE POINTER IS THE READ PATH — after a commit, every family
  *     serve resolves through the manifest with NO builder fallback.
  */
class PipelineManifestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def gen1Rows() =
    PipelineCommit.commitStanding(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  private def resolvedCounts() =
    PipelineCommit.Families
      .map(f => f -> PipelineCommit.storeFor(spark, dir, f).count())
      .toMap

  test("consistency: seven families, one generation, live tables") {
    val rows = gen1Rows()
    assert(rows.map(_._1) == PipelineCommit.Families)
    assert(rows.map(_._2).distinct == Seq(1L),
      s"families sit at DIFFERENT generations: $rows")
    rows.foreach { case (f, _, t) =>
      assert(spark.catalog.tableExists(t),
        s"family $f's manifest pointer names a missing table $t")
    }
    // and the gate emits exactly the resolved counts
    val gate = SparkEntry.queries("q_pipeline_manifest")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(gate == resolvedCounts())
  }

  test("append-only protocol: aborted pass invisible, dangling " +
      "pointer refused, committed generations immutable, and a " +
      "re-publish keeps every previous generation readable") {
    gen1Rows() // the v1 store tables must exist for the copies below
    // an isolated manifest namespace: the protocol laws exercised
    // against their own table, so this spec cannot disturb the real
    // corpus manifest other suites resolve through
    val ns = dir + "#manifest-protocol-spec"
    val mtbl = PipelineCommit.manifestTable(ns)
    def tableRows() = spark.table(mtbl)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val v1 = PipelineCommit.Families
      .map(f => f -> PipelineCommit.storeName(f, dir, 1L))
    val copies = PipelineCommit.Families
      .map(f => f -> (PipelineCommit.storeName(f, dir, 2L) + "_mspec"))
      .toMap
    try {
      assert(PipelineCommit.currentGen(spark, ns).isEmpty,
        "a fresh namespace already has a committed generation")

      // ABORTED PASS: three store writes, no publish → invisible
      Seq("mv", "scd", "dedup").foreach { f =>
        spark.sql(s"DROP TABLE IF EXISTS ${copies(f)}")
        spark.sql(s"CREATE TABLE ${copies(f)} AS SELECT * FROM " +
          PipelineCommit.storeName(f, dir, 1L))
      }
      assert(PipelineCommit.currentGen(spark, ns).isEmpty,
        "an aborted (unpublished) pass became visible to readers")

      // COMMIT generation 1 (the real v1 tables)
      PipelineCommit.publish(spark, ns, 1L, v1)
      assert(PipelineCommit.currentGen(spark, ns).contains(1L))
      assert(PipelineCommit.snapshot(spark, ns, 1L) == v1,
        "the durable table does not hold what was published")
      val rowsAfterG1 = tableRows()
      assert(rowsAfterG1.size == PipelineCommit.Families.size + 1,
        s"generation 1 should be 7 family rows + the sentinel: " +
          s"$rowsAfterG1")
      assert(rowsAfterG1.exists(r =>
          r._1 == 1L && r._2 == PipelineCommit.CommitSentinel),
        "generation 1 committed without its sentinel row")

      // DANGLING POINTER: refused, and the refusal appends NOTHING
      val err = intercept[IllegalArgumentException] {
        PipelineCommit.publish(spark, ns, 2L,
          v1.init :+ ("scd" -> "graft_no_such_table_mspec"))
      }
      assert(err.getMessage.contains("does not exist"),
        s"wrong refusal: ${err.getMessage}")
      assert(tableRows() == rowsAfterG1,
        "a refused publish still appended manifest rows")

      // IMMUTABILITY: same generation, different content → refused
      val err2 = intercept[IllegalArgumentException] {
        PipelineCommit.publish(spark, ns, 1L,
          v1.map { case (f, t) =>
            (f, if (Set("mv", "scd", "dedup")(f)) copies(f) else t) })
      }
      assert(err2.getMessage.contains("immutable"),
        s"wrong refusal: ${err2.getMessage}")
      // ... and identical content → idempotent no-op
      PipelineCommit.publish(spark, ns, 1L, v1)
      assert(tableRows() == rowsAfterG1,
        "an idempotent re-publish duplicated manifest rows")

      // RE-PUBLISH (generation 2, identity copies): the previous
      // generation's rows survive byte-identical — the crash window
      // ADVICE r19 item 4 flagged (DROP-then-write losing the old
      // pointer) cannot exist when nothing is ever dropped
      PipelineCommit.Families.filterNot(
          Set("mv", "scd", "dedup")).foreach { f =>
        spark.sql(s"DROP TABLE IF EXISTS ${copies(f)}")
        spark.sql(s"CREATE TABLE ${copies(f)} AS SELECT * FROM " +
          PipelineCommit.storeName(f, dir, 1L))
      }
      PipelineCommit.publish(spark, ns, 2L,
        PipelineCommit.Families.map(f => f -> copies(f)))
      assert(PipelineCommit.currentGen(spark, ns).contains(2L),
        "the commit did not advance the max committed generation")
      assert(PipelineCommit.snapshot(spark, ns, 2L) ==
          PipelineCommit.Families.map(f => f -> copies(f)),
        "generation 2 does not point at the pass's stores")
      assert(PipelineCommit.snapshot(spark, ns, 1L) == v1,
        "committing generation 2 disturbed generation 1's rows")
      assert(tableRows().filter(_._1 == 1L) ==
          rowsAfterG1.filter(_._1 == 1L),
        "generation 1's physical rows changed under an append")

      // the identity dump resolves to identical contents either way
      PipelineCommit.Families.foreach { f =>
        val c1 = spark.table(
          PipelineCommit.snapshot(spark, ns, 1L).toMap.apply(f)).count()
        val c2 = spark.table(
          PipelineCommit.snapshot(spark, ns, 2L).toMap.apply(f)).count()
        assert(c1 == c2, s"identity copy of $f changed row count")
      }
    } finally {
      copies.values.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("the second generation: six v2 stores publish at generation 2 " +
      "in the SAME table, pointing at the re-entrancy gates' own " +
      "artifacts, without touching the generation-1 rows") {
    val v1 = gen1Rows()
    val gen2 = PipelineCommit.commitSecond(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(gen2.map(_._1) == PipelineCommit.families2(dir).map(_._1))
    assert(gen2.map(_._2).distinct == Seq(2L),
      s"the second generation is not uniformly at generation 2: $gen2")
    assert(gen2.map(t => t._1 -> t._3) ==
        PipelineCommit.families2(dir),
      "generation 2 does not point at the v2 store tables")
    gen2.foreach { case (f, _, t) =>
      assert(spark.catalog.tableExists(t),
        s"family $f's generation-2 pointer names a missing table $t")
    }
    assert(gen1Rows() == v1,
      "publishing generation 2 mutated the generation-1 rows")
  }

  test("the pointer is the read path: after the commits, every " +
      "family serve resolves through the manifest with NO builder " +
      "fallback") {
    PipelineCommit.commitStanding(spark, dir).collect()
    PipelineCommit.commitSecond(spark, dir).collect()
    // a fallback name that cannot exist: if resolution ever fell
    // back instead of following the committed pointer, s.table would
    // throw — so a passing count IS proof the pointer path served
    PipelineCommit.Families.foreach { f =>
      val viaPointer = PipelineCommit.resolveOr(
        spark, dir, f, 1L, "graft_no_such_fallback")
      assert(viaPointer.count() ==
          PipelineCommit.storeFor(spark, dir, f).count(),
        s"family $f's generation-1 pointer serve diverges")
    }
    PipelineCommit.families2(dir).foreach { case (f, t) =>
      val viaPointer = PipelineCommit.resolveOr(
        spark, dir, f, 2L, "graft_no_such_fallback")
      assert(viaPointer.count() == spark.table(t).count(),
        s"family $f's generation-2 pointer serve diverges")
    }
  }
}
