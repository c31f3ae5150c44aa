package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.DedupQueries

/** `q_stream_inc_dedup` — the ingest-time stream-static route — must
  * emit exactly the CROSS half of `q_dedup_incremental`'s pair set
  * (new-dump × standing-corpus, exact Jaccard ≥ 0.5): streaming the
  * dump through micro-batches with a mid-feed barrier may change WHEN
  * a pair is found, never WHICH pairs. Within-dump pairs stay the
  * batch route's job (documented — a stream-stream self-join needs an
  * event-time bound this feed doesn't have). */
class StreamIncDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("streamed cross pairs == batch incremental pairs minus within-dump") {
    val streamed = SparkEntry.queries("q_stream_inc_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val newIds = Tables.documents(spark, dir)
      .filter(col("source") === DedupQueries.IncNewSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchCross = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => newIds.contains(p._1) ^ newIds.contains(p._2)).toSet
    assert(streamed == batchCross,
      s"streamed ${streamed.size} pairs != batch cross ${batchCross.size}")
    // non-vacuity: the stream-static store join actually found pairs
    assert(streamed.nonEmpty, "no cross pair — the stream route is untested")
    // every emitted pair straddles the dump boundary (pure cross route)
    assert(streamed.forall(p =>
      newIds.contains(p._1) ^ newIds.contains(p._2)),
      "a within-dump or store-store pair leaked into the stream route")
  }
}
