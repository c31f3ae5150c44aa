package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** `q_stream_decontaminate` — the ingest-time contamination flag must
  * emit exactly the batch gate's contaminated doc set, once per doc:
  * the bloom prune's false positives die in the exact semi-join
  * (the q_text_decontaminate_bloom law restated under the stream) and
  * false negatives are impossible, so streaming changes WHEN a doc is
  * flagged, never WHETHER. */
class StreamDecontaminateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("streamed flags == batch contaminated set, emitted once each") {
    val streamed = SparkEntry.queries("q_stream_decontaminate")(spark, dir)
      .collect().map(_.getLong(0))
    // once each: no re-emission across the mid-feed barrier
    assert(streamed.distinct.length == streamed.length,
      "a contaminated doc was emitted more than once")
    val batch = SparkEntry.queries("q_text_decontaminate")(spark, dir)
      .filter(col("contaminated"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed.toSet == batch,
      s"streamed ${streamed.length} flags != batch ${batch.size}")
    assert(batch.nonEmpty, "no contaminated doc — the gate is vacuous")
  }
}
