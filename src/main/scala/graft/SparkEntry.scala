package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query catalog is contributed by per-domain objects under
  * `graft.queries`; every entry has a DuckDB oracle unless the operator
  * is not SQL-expressible (those get the driver's rows-only check).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (RelationalQueries.queries, RelationalQueries.oracles),
    (GraphQueries.queries, GraphQueries.oracles),
    (WikiQueries.queries, WikiQueries.oracles),
    (TextQueries.queries, TextQueries.oracles),
    (DedupQueries.queries, DedupQueries.oracles),
    (SimilarityQueries.queries, SimilarityQueries.oracles),
    (EventQueries.queries, EventQueries.oracles),
    (MultimodalQueries.queries, MultimodalQueries.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pagerank")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** Gate-only entries: forced-low-cap variants that exercise an
    * overflow ROUTE of the same engine path their parent query already
    * times (q_dedup_ngram_capped is q_dedup_ngram with the cap wrenched
    * down; likewise editdist). Verify runs them — the routes must stay
    * hash-correct — but Bench skips them so each engine path is
    * measured once, not booked twice (VERDICT r7 item 8). */
  val gateOnly: Set[String] =
    Set("q_dedup_ngram_capped", "q_dedup_editdist_capped")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
