package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming graph-maintenance trigger — the ingest-time half of
  * q_pagerank_maintain (reference: the 13-job batch pipeline,
  * PageRank.java:422-498, re-ranks on a dump cadence; this computes
  * the warm-vs-rebuild signal WHILE the dump arrives, the
  * q_stream_maintain monitor→actuator shape brought to the graph
  * family).
  *
  * Scale design: the streaming side is only the in-flight micro-batch
  * of candidate edges — both joins are stream-static (stateless): the
  * red-link screen is a left-semi against the page universe, the
  * novelty screen a left-outer against the STANDING edge set (a
  * build-once artifact, checkpointed by the caller so the static side
  * doesn't re-plan its derivation per micro-batch). The only stateful
  * operator is the per-(src, dst) update-mode count, whose state is
  * bounded by the dump's DISTINCT NEW edges — dump-sized, never
  * corpus-sized.
  */
object GraphStreams {

  /** Per-(src, dst) running occurrence counts of NEW edges (screened
    * against `pages`, absent from `standing`) in a streaming
    * `edges(src, dst)` feed — update mode. Which intermediate updates
    * appear depends on the chunking, but the DISTINCT (src, dst) key
    * set of the emitted table is chunking-invariant: every new edge
    * appears at least once, no standing or red-link edge ever does —
    * so the caller's distinct-count equals the batch churn numerator
    * exactly. */
  def churnStream(edges: DataFrame, standing: DataFrame,
      pages: DataFrame): DataFrame =
    edges
      .join(pages, edges("dst") === pages("page"), "left_semi")
      .join(standing.withColumn("std", lit(true)), Seq("src", "dst"),
        "left_outer")
      .filter(col("std").isNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
}
