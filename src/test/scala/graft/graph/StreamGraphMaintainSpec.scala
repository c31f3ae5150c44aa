package graft.graph

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.streaming.GraphStreams

/** `q_stream_graph_maintain` — the graph family's ingest-time
  * maintenance trigger (the q_stream_maintain monitor→actuator shape).
  *
  * Laws:
  *  1. DECISION ≡ BATCH — the streamed (n_new, n_standing, rebuilt)
  *     row equals the batch churn computation q_pagerank_maintain
  *     actuates ([[graft.queries.GraphQueries.maintainRebuild]]'s
  *     counts and decision), on every field.
  *  2. SCREEN — on a constructed feed, [[GraphStreams.churnStream]]
  *     emits exactly the novel, non-red-link edges: standing edges
  *     and red-link edges never surface, duplicates collapse to one
  *     key, and a high-churn dump FIRES the rebuild branch (the
  *     branch the sf0.01 corpus leaves cold).
  */
class StreamGraphMaintainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("streamed decision == the batch churn law, every field") {
    val row = SparkEntry.queries("q_stream_graph_maintain")(spark, dir)
      .head
    val g = GraphCatalog.tpch(spark, dir)
    val thr = GraphCatalog.tpchOrderThreshold(spark, dir)
    val ns = LinkGraph.removeRedLinks(
      LinkGraph.tpchEdges(spark, dir, maxOrder = Some(thr)), g.pages)
      .count()
    val nf = g.edges.count()
    assert(row.getLong(0) == nf - ns,
      s"streamed n_new ${row.getLong(0)} != batch ${nf - ns}")
    assert(row.getLong(1) == ns,
      s"streamed n_standing ${row.getLong(1)} != batch $ns")
    assert(row.getBoolean(2) ==
        graft.queries.GraphQueries.maintainRebuild(spark, dir),
      "streamed decision diverged from maintainRebuild")
  }

  test("constructed feed: novel edges only, duplicates collapse, " +
      "high churn fires the rebuild branch") {
    import spark.implicits._
    val pages = Seq("a", "b", "c", "d").toDF("page")
    val standing = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    // feed: one standing edge (suppressed), one red-link edge (dst
    // not a page — suppressed), one novel edge twice (collapses)
    val feed = Seq(("a", "b"), ("a", "x"), ("c", "d"), ("c", "d"))
      .toDF("src", "dst")
    val emitted = GraphStreams.churnStream(feed, standing, pages)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(emitted.toSeq == Seq(("c", "d", 2L)),
      s"screen law broken: $emitted")
    // churn 1/2 = 0.5 > the 0.10 bound — the rebuild branch FIRES
    val nNew = emitted.length.toLong
    val ns = standing.count()
    assert(nNew.toDouble / ns.toDouble >
        graft.queries.GraphQueries.ChurnBound,
      "the constructed dump no longer exercises the fired branch")
  }
}
