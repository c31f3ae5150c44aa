package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected components: the converged HashMin loop must induce the
  * same vertex partition as GraphX's built-in connectedComponents (the
  * scale path), and the fixed-round form must equal the converged form
  * once rounds ≥ diameter.
  */
class ComponentsSpec extends SparkSpec {

  /** Deterministic sparse random graph: ~150 vertices, seeded edges →
    * several non-trivial components plus isolated vertices. */
  private def randomGraph = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val n = 150
    val edges = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    (0 until n).map(_.toString).toDF("page") ->
      edges.map { case (a, b) => (a.toString, b.toString) }.toDF("src", "dst")
  }

  private def grouping(df: org.apache.spark.sql.DataFrame): Set[Set[String]] =
    df.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet

  test("converged HashMin partitions vertices exactly like GraphX connectedComponents") {
    val (pages, edges) = randomGraph
    val ours = grouping(Components.components(pages, edges))

    val vids = pages.collect().map(_.getString(0))
    val vertexRdd = spark.sparkContext
      .parallelize(vids.map(v => (v.toLong, v)))
    val edgeRdd = spark.sparkContext.parallelize(
      edges.collect().map(r => Edge(r.getString(0).toLong,
        r.getString(1).toLong, ())))
    val cc = Graph(vertexRdd, edgeRdd).connectedComponents()
    val graphx = cc.vertices.collect()
      .groupBy(_._2).values.map(_.map(_._1.toString).toSet).toSet

    assert(ours == graphx)
  }

  test("fixed-round labelPropagation equals converged components at rounds >= diameter") {
    val (pages, edges) = randomGraph
    val converged = Components.components(pages, edges)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // 150 vertices → diameter bounded by the vertex count; 150 rounds
    // is a safe over-approximation (HashMin converges in diameter hops)
    val fixed = Components.labelPropagation(pages, edges, rounds = 20)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(fixed == converged)
  }

  test("converged components on a path graph: one component, min label wins") {
    val s = spark
    import s.implicits._
    val pages = Seq("a", "b", "c", "d").toDF("page")
    val edges = Seq(("b", "a"), ("c", "b"), ("d", "c")).toDF("src", "dst")
    val got = Components.components(pages, edges)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }
}
