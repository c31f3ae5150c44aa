package graft.graph

import graft.SparkSpec

/** A1 adjacency — in particular the mega-hub outlink cap (`maxOutlinks`),
  * which bounds a single aggregation row's memory at scale
  * (LinkGraph.adjacency scale caveat): capped output must be a
  * deterministic prefix of the sorted outlink array.
  */
class LinkGraphSpec extends SparkSpec {

  private def graph() = {
    val s = spark
    import s.implicits._
    val pages = Seq("a", "b", "c", "d", "e").toDF("page")
    // a is the hub (4 outlinks, inserted out of order); c/d/e dangling
    val edges = Seq("a" -> "e", "a" -> "c", "a" -> "b", "a" -> "d",
      "b" -> "a").toDF("src", "dst")
    (pages, edges)
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  test("adjacency: sorted outlinks, dangling pages get empty arrays") {
    val (pages, edges) = graph()
    val adj = collect(LinkGraph.adjacency(edges, pages))
    assert(adj("a") == Seq("b", "c", "d", "e"))
    assert(adj("b") == Seq("a"))
    assert(adj("c").isEmpty && adj("d").isEmpty && adj("e").isEmpty)
  }

  test("maxOutlinks caps hubs to a deterministic sorted prefix") {
    val (pages, edges) = graph()
    val capped = collect(LinkGraph.adjacency(edges, pages, Some(2)))
    assert(capped("a") == Seq("b", "c")) // first 2 of the SORTED array
    assert(capped("b") == Seq("a")) // under the cap: unchanged
    assert(capped("c").isEmpty)
    // deterministic: a second evaluation yields the identical arrays
    assert(collect(LinkGraph.adjacency(edges, pages, Some(2))) == capped)
  }

  test("a cap at or above the max degree is the identity") {
    val (pages, edges) = graph()
    assert(collect(LinkGraph.adjacency(edges, pages, Some(4))) ==
      collect(LinkGraph.adjacency(edges, pages)))
  }
}
