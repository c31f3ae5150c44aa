package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.{LinkGraph, PageRank}

/** The reference's core surface — link graph + PageRank — as driver
  * queries over the TPC-H-ish tables (graph: customers cite suppliers
  * they bought from; see [[LinkGraph.tpchEdges]]). Oracles are ANSI SQL
  * for DuckDB; the 8 PageRank iterations are unrolled as chained CTEs
  * (DuckDB's recursive CTEs can't aggregate in the recursive term).
  */
object GraphQueries {

  /** Shared SQL fragments for the graph CTEs. */
  private val graphCtes =
    """pages AS (
         SELECT 'c' || CAST(c_custkey AS VARCHAR) AS page FROM customer
         UNION ALL
         SELECT 's' || CAST(s_suppkey AS VARCHAR) AS page FROM supplier),
       edges AS (
         SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                         's' || CAST(l_suppkey AS VARCHAR) AS dst
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       good AS (
         SELECT e.src, e.dst FROM edges e
         WHERE EXISTS (SELECT 1 FROM pages p WHERE p.page = e.dst))"""

  /** Reference-convention PageRank unrolled to `iters` chained CTEs:
    * r0 = 1/N; r_k = 0.15/N + 0.85 * Σ_in r_{k-1}(src)/deg(src).
    * Dangling mass lost (no redistribution term) — matches
    * /root/reference/src/PageRank/PageRank.java:305-316.
    */
  private def pagerankSql(iters: Int, select: String): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
            SELECT p.page,
                   0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(m.mass, 0) AS pr
            FROM pages p LEFT JOIN (
              SELECT g.dst, SUM(r.pr / d.deg) AS mass
              FROM good g
              JOIN r${k - 1} r ON g.src = r.page
              JOIN deg d ON g.src = d.src
              GROUP BY g.dst) m ON p.page = m.dst)"""
    }.mkString(",\n")
    s"""WITH $graphCtes,
        deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                FROM good GROUP BY src),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pages),
        r0 AS (SELECT page, 1.0 / (SELECT n FROM nn) AS pr FROM pages),
        $iterCtes
        $select"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: red-link removal — edges surviving the existence semi-join.
    "q_graph_edges" -> ((s, d) => {
      LinkGraph.removeRedLinks(LinkGraph.tpchEdges(s, d), LinkGraph.tpchPages(s, d))
        .orderBy(col("src"), col("dst"))
    }),

    // A1: adjacency lists; outlinks rendered as a sorted CSV string so the
    // oracle compare is array-free and order-deterministic. Dangling pages
    // (all suppliers) appear with n_out=0 and outs=''.
    "q_graph_adjacency" -> ((s, d) => {
      val adj = LinkGraph.adjacency(
        LinkGraph.removeRedLinks(LinkGraph.tpchEdges(s, d), LinkGraph.tpchPages(s, d)),
        LinkGraph.tpchPages(s, d))
      adj.select(col("page"), size(col("outlinks")).cast("long").as("n_out"),
          array_join(col("outlinks"), ",").as("outs"))
        .orderBy(col("page"))
    }),

    // A2: N (page count) as a one-row result.
    "q_graph_count" -> ((s, d) => {
      import s.implicits._
      Seq(LinkGraph.countPages(LinkGraph.tpchPages(s, d))).toDF("n")
    }),

    // Flagship: 8 reference-convention PageRank iterations, every page.
    "q_pagerank" -> ((s, d) => {
      val pages = LinkGraph.tpchPages(s, d)
      val edges = LinkGraph.removeRedLinks(LinkGraph.tpchEdges(s, d), pages)
      PageRank.run(pages, edges)
        .select(col("page"), round(col("rank"), 6).as("pr"))
        .orderBy(col("page"))
    }),

    // F1+O1+M2: threshold rank > 5/N, globally sorted descending.
    "q_pagerank_top" -> ((s, d) => {
      val pages = LinkGraph.tpchPages(s, d)
      val edges = LinkGraph.removeRedLinks(LinkGraph.tpchEdges(s, d), pages)
      val n = LinkGraph.countPages(pages)
      PageRank.topRanks(PageRank.run(pages, edges), n)
        .select(col("page"), round(col("rank"), 6).as("pr"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_graph_edges" ->
      s"WITH $graphCtes SELECT src, dst FROM good ORDER BY src, dst",
    "q_graph_adjacency" ->
      s"""WITH $graphCtes
          SELECT p.page,
                 COUNT(g.dst) AS n_out,
                 COALESCE(STRING_AGG(g.dst, ',' ORDER BY g.dst), '') AS outs
          FROM pages p LEFT JOIN good g ON p.page = g.src
          GROUP BY p.page ORDER BY p.page""",
    "q_graph_count" ->
      """SELECT (SELECT COUNT(*) FROM customer) +
                (SELECT COUNT(*) FROM supplier) AS n""",
    "q_pagerank" -> pagerankSql(PageRank.DefaultIters,
      "SELECT page, ROUND(pr, 6) AS pr FROM r8 ORDER BY page"),
    "q_pagerank_top" -> pagerankSql(PageRank.DefaultIters,
      """SELECT page, ROUND(pr, 6) AS pr FROM r8
         WHERE pr > 5.0 / (SELECT n FROM nn)
         ORDER BY pr DESC, page""")
  )
}
