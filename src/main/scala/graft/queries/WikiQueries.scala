package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.{GraphCatalog, PageRank}

/** End-to-end coverage of the reference's actual domain: wiki-XML
  * ingestion → link extraction → red-link removal → PageRank →
  * threshold/order — the full 13-job DAG
  * (/root/reference/src/PageRank/PageRank.java:422-498) as declarative
  * Spark over a dump synthesized from the driver's tables
  * ([[graft.wiki.WikiDump]]).
  *
  * The oracles never see the XML: by construction the dump's cleaned
  * edge set is exactly `DISTINCT ('p_'||l_partkey, 's_'||l_suppkey)`
  * from lineitem ∪ `('s_'||s_suppkey, 'hub')` from supplier, so DuckDB
  * recomputes expectations relationally — any bug in the XML parse,
  * regex extraction, pipe handling, validity filter, dedup, or
  * semi-join shows up as a mismatch.
  */
object WikiQueries {

  private val wikiCtes =
    """pages AS (
         SELECT 'p_' || CAST(p_partkey AS VARCHAR) AS page FROM part
         UNION ALL
         SELECT 's_' || CAST(s_suppkey AS VARCHAR) AS page FROM supplier
         UNION ALL
         SELECT 'hub'),
       good AS (
         SELECT DISTINCT 'p_' || CAST(l_partkey AS VARCHAR) AS src,
                         's_' || CAST(l_suppkey AS VARCHAR) AS dst
         FROM lineitem
         UNION ALL
         SELECT 's_' || CAST(s_suppkey AS VARCHAR), 'hub' FROM supplier)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+P1+P2+J1: parse XML pages, extract/clean/dedup links, drop red
    // links. Covers the whole job-1 surface of the reference.
    "q_wiki_links" -> ((s, d) => {
      GraphCatalog.wiki(s, d).edges.orderBy(col("src"), col("dst"))
    }),

    // Page count N over the parsed dump (A2 on the wiki path).
    "q_wiki_count" -> ((s, d) => {
      import s.implicits._
      Seq(GraphCatalog.wiki(s, d).n).toDF("n")
    }),

    // The FULL file path of S1: the synthesized dump is written to disk
    // as rootless concatenated-record XML (the reference's actual input
    // shape), read back through the custom graft-xml DataSource V2 with
    // 64 KiB splits (records straddle many split boundaries), parsed,
    // and counted — same oracle as q_wiki_count, so a single dropped or
    // duplicated record at any boundary fails the gate.
    "q_wiki_source_count" -> ((s, d) => {
      import s.implicits._
      val dir = graft.wiki.WikiDump.materializedDump(s, d)
      val n = graft.wiki.WikiIngest.parsePageXml(
        s.read.format("graft-xml").option("path", dir)
          .option("maxSplitBytes", (64 * 1024).toString).load(), "xml")
        .count()
      Seq(n).toDF("n")
    }),

    // The reference pipeline end to end: 8 PageRank iterations over the
    // parsed dump, every page ranked.
    "q_wiki_pagerank" -> ((s, d) => {
      GraphCatalog.wikiRanks(s, d)
        .select(col("page"), round(col("rank"), 6).as("pr"))
        .orderBy(col("page"))
    }),

    // F1+O1: threshold + global descending order on the wiki ranks at
    // the reference's hard-coded multiplier 5.0 (PageRank.java:336,346)
    // — non-vacuous on this graph: the hub page and the supplier pages
    // concentrate rank mass well above 5/N (WikiDump hub design).
    "q_wiki_top" -> ((s, d) => {
      val g = GraphCatalog.wiki(s, d)
      GraphCatalog.wikiRanks(s, d)
        .select(col("page"), round(col("rank"), 6).as("pr"))
        .filter(col("pr") > lit(5.0) / lit(g.n.toDouble))
        .orderBy(col("pr").desc, col("page"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_wiki_links" ->
      s"WITH $wikiCtes SELECT src, dst FROM good ORDER BY src, dst",
    "q_wiki_count" ->
      """SELECT (SELECT COUNT(*) FROM part) +
                (SELECT COUNT(*) FROM supplier) + 1 AS n""",
    "q_wiki_source_count" ->
      """SELECT (SELECT COUNT(*) FROM part) +
                (SELECT COUNT(*) FROM supplier) + 1 AS n""",
    "q_wiki_pagerank" -> PageRankOracle.sql(wikiCtes, PageRank.DefaultIters,
      "SELECT page, ROUND(pr, 6) AS pr FROM r8 ORDER BY page"),
    "q_wiki_top" -> PageRankOracle.sql(wikiCtes, PageRank.DefaultIters,
      """SELECT page, ROUND(pr, 6) AS pr FROM r8
         WHERE ROUND(pr, 6) > 5.0 / (SELECT n FROM nn)
         ORDER BY ROUND(pr, 6) DESC, page""")
  )
}
