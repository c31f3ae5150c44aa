package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closed-form checks of [[Hits]] (the sf-data parity with the DuckDB
  * unrolled-CTE oracle is the q_graph_hits correctness gate). */
class HitsSpec extends SparkSpec {

  private def df(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }
  private def pagesOf(ps: String*) = {
    import spark.implicits._
    ps.toDF("page")
  }

  test("star graph: the center is the sole authority, leaves equal hubs") {
    val pages = pagesOf("c", "l1", "l2", "l3")
    val edges = df(Seq("l1" -> "c", "l2" -> "c", "l3" -> "c"))
    val out = Hits.run(pages, edges).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // authority concentrates on c (L2-normalized → exactly 1.0), hubs
    // split evenly over the three leaves (1/√3 each)
    assert(math.abs(out("c")._1 - 1.0) < 1e-12)
    assert(out("c")._2 == 0.0)
    val h = 1.0 / math.sqrt(3.0)
    for (l <- Seq("l1", "l2", "l3")) {
      assert(out(l)._1 == 0.0)
      assert(math.abs(out(l)._2 - h) < 1e-12)
    }
  }

  test("edgeless graph normalizes to all-zero scores, not NaN") {
    val out = Hits.run(pagesOf("a", "b"), df(Nil)).collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0))
  }

  test("iteration count not divisible by TruncateEvery still runs") {
    val pages = pagesOf("a", "b", "c")
    val edges = df(Seq("a" -> "b", "b" -> "c", "c" -> "a"))
    // a directed 3-cycle is degree-regular: auth = hub = 1/√3 everywhere
    val out = Hits.run(pages, edges, iters = 3).collect()
    val v = 1.0 / math.sqrt(3.0)
    assert(out.forall(r => math.abs(r.getDouble(1) - v) < 1e-12 &&
      math.abs(r.getDouble(2) - v) < 1e-12))
  }

  test("scores are scale-free: 8 vs 9 iterations converge on the star") {
    val pages = pagesOf("c", "l1", "l2")
    val edges = df(Seq("l1" -> "c", "l2" -> "c"))
    val a = Hits.run(pages, edges, iters = 8).orderBy(col("page")).collect()
    val b = Hits.run(pages, edges, iters = 9).orderBy(col("page")).collect()
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x.getDouble(1) - y.getDouble(1)) < 1e-9)
      assert(math.abs(x.getDouble(2) - y.getDouble(2)) < 1e-9)
    }
  }
}
