package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** `q_pipeline_manifest` / [[PipelineCommit]] — the cross-family
  * commit point (VERDICT r18 item 3): stores first, ONE atomic
  * manifest overwrite last, serves resolving store names through it.
  *
  * Laws:
  *  1. CONSISTENCY — one committed pass registers all seven families
  *     at the SAME dump_id, each resolving to an existing table.
  *  2. ABORTED PASS IS INVISIBLE — a pass that writes N of 7 v2
  *     stores and dies BEFORE the manifest write leaves every
  *     manifest-resolved read on the previous snapshot, row for row.
  *  3. COMMIT FLIPS ATOMICALLY — once all 7 v2 stores exist and the
  *     manifest is overwritten, every read resolves v2 (and only
  *     then).
  *  4. NO DANGLING POINTERS — publishing a manifest naming a missing
  *     table is refused loudly.
  */
class PipelineManifestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def manifestRows() =
    PipelineCommit.commitStanding(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  private def resolvedCounts() =
    PipelineCommit.Families
      .map(f => f -> PipelineCommit.storeFor(spark, dir, f).count())
      .toMap

  test("consistency: seven families, one dump_id, live tables") {
    val rows = manifestRows()
    assert(rows.map(_._1) == PipelineCommit.Families)
    assert(rows.map(_._2).distinct == Seq(1L),
      s"families sit at DIFFERENT dump ids: $rows")
    rows.foreach { case (f, _, t) =>
      assert(spark.catalog.tableExists(t),
        s"family $f's manifest pointer names a missing table $t")
    }
    // and the gate emits exactly the resolved counts
    val gate = SparkEntry.queries("q_pipeline_manifest")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(gate == resolvedCounts())
  }

  test("an aborted pass is invisible; a full commit flips atomically; " +
      "dangling pointers are refused") {
    val before = resolvedCounts()
    val v1 = manifestRows()
    val v2Names = PipelineCommit.Families
      .map(f => f -> PipelineCommit.storeName(f, dir, 2L)).toMap
    try {
      // ABORT: the pass writes only three of seven v2 stores (content
      // = a copy of v1, the identity dump) and dies before publish
      Seq("mv", "scd", "dedup").foreach { f =>
        spark.sql(s"DROP TABLE IF EXISTS ${v2Names(f)}")
        spark.sql(s"CREATE TABLE ${v2Names(f)} AS SELECT * FROM " +
          PipelineCommit.storeName(f, dir, 1L))
      }
      assert(resolvedCounts() == before,
        "an aborted (unpublished) pass changed what readers resolve")
      assert(manifestRows() == v1,
        "an aborted pass mutated the manifest itself")

      // publishing a manifest that names a missing table must refuse
      val err = intercept[IllegalArgumentException] {
        PipelineCommit.publish(spark, dir,
          PipelineCommit.Families.map(f => (f, 2L, v2Names(f))))
      }
      assert(err.getMessage.contains("does not exist"),
        s"wrong refusal: ${err.getMessage}")
      assert(resolvedCounts() == before,
        "a refused publish still changed resolution")

      // COMMIT: finish the remaining four stores, then ONE publish
      PipelineCommit.Families.filterNot(
          Set("mv", "scd", "dedup")).foreach { f =>
        spark.sql(s"DROP TABLE IF EXISTS ${v2Names(f)}")
        spark.sql(s"CREATE TABLE ${v2Names(f)} AS SELECT * FROM " +
          PipelineCommit.storeName(f, dir, 1L))
      }
      PipelineCommit.publish(spark, dir,
        PipelineCommit.Families.map(f => (f, 2L, v2Names(f))))
      val flipped = manifestRows()
      assert(flipped.map(_._2).distinct == Seq(2L),
        "the commit did not flip every family to dump 2")
      assert(flipped.map(t => t._1 -> t._3).toMap == v2Names,
        "the commit did not point every family at its v2 store")
      assert(resolvedCounts() == before,
        "the identity dump changed resolved contents — the copy or " +
          "the resolution is broken")
    } finally {
      // restore the standing snapshot for every other consumer
      PipelineCommit.publish(spark, dir,
        PipelineCommit.Families.map(f =>
          (f, 1L, PipelineCommit.storeName(f, dir, 1L))))
      PipelineCommit.Families.foreach { f =>
        spark.sql(s"DROP TABLE IF EXISTS ${v2Names(f)}")
      }
    }
    assert(manifestRows() == v1, "the restore did not round-trip")
  }

  test("the second generation: six v2 stores publish at dump_id 2, " +
      "pointing at the re-entrancy gates' own artifacts, without " +
      "touching the dump-1 snapshot") {
    val v1 = manifestRows()
    val gen2 = PipelineCommit.commitSecond(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(gen2.map(_._1) == PipelineCommit.families2(dir).map(_._1))
    assert(gen2.map(_._2).distinct == Seq(2L),
      s"the second generation is not uniformly at dump 2: $gen2")
    assert(gen2.map(t => t._1 -> t._3) ==
        PipelineCommit.families2(dir),
      "generation 2 does not point at the v2 store tables")
    gen2.foreach { case (f, _, t) =>
      assert(spark.catalog.tableExists(t),
        s"family $f's generation-2 pointer names a missing table $t")
    }
    assert(manifestRows() == v1,
      "publishing generation 2 mutated the dump-1 manifest")
  }
}
