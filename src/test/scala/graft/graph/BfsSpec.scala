package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Bfs.hopDistances]]: closed-form level sets on a hand-built graph,
  * the round cap, unreachable-vertex exclusion, and source-row edge
  * cases. */
class BfsSpec extends SparkSpec {

  import spark.implicits._

  // path a-b-c-d-e, a triangle f-g-h hanging off c (via c-f), and an
  // isolated island x-y plus a fully isolated vertex z
  private def fixture = {
    val pages = Seq("a", "b", "c", "d", "e", "f", "g", "h", "x", "y", "z")
      .toDF("page")
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("c", "f"), ("f", "g"), ("g", "h"), ("h", "f"),
      ("x", "y")
    ).toDF("src", "dst")
    (pages, edges)
  }

  private def run(source: String, maxRounds: Int = 16): Map[String, Int] = {
    val (pages, edges) = fixture
    Bfs.hopDistances(pages, edges, source, maxRounds)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
  }

  test("level sets from 'a': path, branch, and cycle distances are exact") {
    assert(run("a") == Map(
      "a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3, "e" -> 4,
      "f" -> 3, "g" -> 4, "h" -> 4))
  }

  test("edges are traversed undirected: BFS from 'e' walks src<-dst") {
    assert(run("e") == Map(
      "e" -> 0, "d" -> 1, "c" -> 2, "b" -> 3, "a" -> 4,
      "f" -> 3, "g" -> 4, "h" -> 4))
  }

  test("unreachable islands are absent, not infinite") {
    val d = run("a")
    assert(!d.contains("x") && !d.contains("y") && !d.contains("z"))
    assert(run("x") == Map("x" -> 0, "y" -> 1))
  }

  test("an isolated source yields exactly its own zero row") {
    assert(run("z") == Map("z" -> 0))
  }

  test("a source absent from the vertex table yields an empty result") {
    assert(run("nope").isEmpty)
  }

  test("maxRounds caps the explored radius") {
    val d = run("a", maxRounds = 2)
    assert(d == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("distances agree with a driver-side reference BFS") {
    val (pages, edges) = fixture
    val es = edges.collect().map(r => (r.getString(0), r.getString(1)))
    val adj = (es ++ es.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def ref(src: String): Map[String, Int] = {
      var dist = Map(src -> 0)
      var frontier = Set(src)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .diff(dist.keySet)
        val d = dist(frontier.head) + 1
        dist ++= next.map(_ -> d)
        frontier = next
      }
      dist
    }
    for (src <- Seq("a", "c", "h", "x"))
      assert(run(src) == ref(src), s"source $src")
  }

  test("result schema is (page string, dist int) — the oracle contract") {
    val (pages, edges) = fixture
    val df = Bfs.hopDistances(pages, edges, "a")
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("page", "string"), ("dist", "int")))
  }
}
