package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Link-graph construction — the Spark-native re-expression of the
  * reference's jobs 1–3 (cf. /root/reference/src/PageRank/PageRank.java:
  * MarkWikiLinksReducer 130-157 [J1 existence semi-join / "red-link
  * removal"], RedLinksReducer 175-200 [A1 adjacency aggregation],
  * OutLinkParserMap/NReducer 211-238 [A2 global count]).
  *
  * Shape contract used throughout this package:
  *   pages: DataFrame["page": String]           — the vertex set
  *   edges: DataFrame["src": String, "dst": String] — directed edges
  *
  * Scale notes (100 TB): the semi-join shuffles on `dst`; when the page
  * dimension is broadcast-able Catalyst/AQE picks BroadcastHashJoin
  * (left_semi), otherwise a shuffled semi-join with no single-task
  * bottleneck — unlike the reference's setNumReduceTasks(1)
  * (PageRank.java:442). Adjacency is one hash aggregation on `src`
  * (map-side partial + final), replacing the reference's combiner-less
  * reduce-only grouping (combiner commented out, PageRank.java:530).
  */
object LinkGraph {

  /** J1: keep only edges whose destination is a real page ("remove red
    * links"). Distinct semantics match the reference's per-key HashSet
    * dedup (PageRank.java:136,143) — an edge appears once.
    */
  def removeRedLinks(edges: DataFrame, pages: DataFrame): DataFrame =
    edges
      .dropDuplicates("src", "dst")
      .join(pages, edges("dst") === pages("page"), "left_semi")

  /** A1: adjacency list per page. Every real page gets a row, dangling
    * pages (no surviving outlinks) get an empty array — exactly the
    * reference's `(page,"!")` pass-through trick (PageRank.java:185-197)
    * without the in-band marker. `array_sort` makes the result
    * deterministic (the reference's tab-concat order was shuffle order).
    *
    * Scale caveat (ADVICE r1 item 5): `collect_set` materializes a page's
    * full outlink set as one aggregation row; a mega-hub (out-degree in
    * the hundreds of millions) would blow a single executor's memory. The
    * scale path keeps the graph in exploded edge form — [[PageRank]]
    * never calls this — and callers that genuinely need arrays at scale
    * pass `maxOutlinks` to cap them (sorted, so the cap is deterministic).
    */
  def adjacency(edges: DataFrame, pages: DataFrame,
                maxOutlinks: Option[Int] = None): DataFrame = {
    val outs = array_sort(collect_set(col("dst")))
    val capped = maxOutlinks.fold(outs)(k => slice(outs, 1, k))
    val agg = edges.groupBy(col("src").as("page"))
      .agg(capped.as("outlinks"))
    pages.join(agg, Seq("page"), "left")
      .select(col("page"),
        coalesce(col("outlinks"), array().cast("array<string>")).as("outlinks"))
  }

  /** A2: N = number of pages. A driver-side action; Spark's count is a
    * partial-then-final aggregate (no shuffle of 1s, unlike the
    * reference's combiner-less ("N",1) shuffle, PageRank.java:211-238).
    */
  def countPages(pages: DataFrame): Long = pages.count()

  // ---------------------------------------------------------------------
  // Concrete graph over the driver's TPC-H-ish tables: customers cite the
  // suppliers they bought from (orders ⋈ lineitem). Node ids are prefixed
  // ('c'/'s') so the two key spaces cannot collide. Suppliers have no
  // outlinks → they are the dangling pages of this graph, exercising the
  // reference's dangling-mass-lost semantics (PageRank.java:305-316).
  // ---------------------------------------------------------------------

  private def cid(c: Column): Column = concat(lit("c"), c.cast("string"))
  private def sid(c: Column): Column = concat(lit("s"), c.cast("string"))

  /** Vertex set: all customers ∪ all suppliers. */
  def tpchPages(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(cid(col("c_custkey")).as("page"))
    val s = Tables.supplier(spark, dir).select(sid(col("s_suppkey")).as("page"))
    c.unionAll(s)
  }

  /** Edge set: distinct (customer → supplier) purchase relationships.
    * orders⋈lineitem shuffles on orderkey; at scale both sides are huge so
    * this is a shuffled hash / sort-merge join — correct. The projection
    * to two columns happens before the join so only (o_orderkey,
    * o_custkey) and (l_orderkey, l_suppkey) are scanned (column pruning).
    *
    * The distinct runs on the RAW INT key pair, and the string node ids
    * are built afterwards: the dedup shuffle then carries 16 bytes/row of
    * fixed-width ints (cheap hashing, partial-agg friendly) instead of
    * two materialized strings per raw pair — at |lineitem| rows that is
    * the difference between shuffling the corpus and shuffling the edge
    * set. [[removeRedLinks]]'s own dropDuplicates then dedups the
    * already-distinct string pairs — a cheap |E|-sized pass.
    */
  /** `maxOrder` restricts to orders BELOW the high-water mark — the
    * standing edge set before a dump of new orders arrived
    * (q_pagerank_incremental). A range predicate on the orders scan:
    * the standing build never reads a new-dump byte, and at 100 TB the
    * parquet row-group stats prune the dump's files entirely. */
  def tpchEdges(spark: SparkSession, dir: String,
      maxOrder: Option[Long] = None,
      minOrder: Option[Long] = None): DataFrame = {
    val o0 = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val o1 = maxOrder.fold(o0)(t => o0.filter(col("o_orderkey") < lit(t)))
    // the dump slice (q_stream_graph_maintain's feed): orders at or
    // above the high-water mark — a range predicate, scan-pruned
    val o = minOrder.fold(o1)(t => o1.filter(col("o_orderkey") >= lit(t)))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .select(cid(col("o_custkey")).as("src"), sid(col("l_suppkey")).as("dst"))
  }

  /** Weighted edge set: (customer → supplier, w = purchase-line
    * multiplicity). Same join/projection shape as [[tpchEdges]] but the
    * dedup becomes a partial-agg'd COUNT on the raw int key pair —
    * still 16 B/row across the shuffle plus one long. The weight is the
    * natural interaction strength of the citation graph (how many line
    * items the customer bought from that supplier). */
  def tpchWeightedEdges(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("w"))
      .select(cid(col("o_custkey")).as("src"), sid(col("l_suppkey")).as("dst"),
        col("w"))
  }
}
