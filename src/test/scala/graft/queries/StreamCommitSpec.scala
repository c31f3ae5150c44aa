package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** `q_stream_commit` — a dump LANDS as a stream and the pass ends in
  * a manifest commit (VERDICT r19 gap 5: the stream gates replayed
  * and asserted outputs, but nothing drove the COMMIT protocol).
  *
  * Laws:
  *  1. LANDING ∘ MERGE ≡ BATCH MERGE — the stream-landed dump, merged
  *     and served through the pointer, answers exactly what the batch
  *     merge (q_events_scd_inc) answers, row for row: the landing
  *     lost nothing and duplicated nothing under the replay chunking.
  *  2. THE COMMIT HAPPENED — generation 4 is committed with exactly
  *     the streamed store's pointer, and the serve resolves through
  *     it with NO builder fallback.
  */
class StreamCommitSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("stream landing + merge + pointer serve == batch merge") {
    val got = SparkEntry.queries("q_stream_commit")(spark, dir).collect()
    val want = SparkEntry.queries("q_events_scd_inc")(spark, dir).collect()
    assert(got.toSeq == want.toSeq,
      "the stream-landed merge diverged from the batch merge")
  }

  test("generation 4 is committed at the streamed store, and the " +
      "serve resolves through the pointer") {
    SparkEntry.queries("q_stream_commit")(spark, dir).collect()
    val tbl = "graft_scd_st_" + org.apache.commons.codec.digest
      .DigestUtils.md5Hex(dir).take(8)
    assert(PipelineCommit.snapshot(spark, dir, 4L) == Seq("scd" -> tbl),
      "generation 4 does not point at the streamed store")
    val viaPointer = PipelineCommit.resolveOr(
      spark, dir, "scd", 4L, "graft_no_such_fallback")
    assert(viaPointer.count() == spark.table(tbl).count(),
      "the generation-4 pointer serve diverges from the store table")
  }
}
