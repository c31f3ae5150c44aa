package graft.graph

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based checks of fixed-round HashMin: on arbitrary random
  * graphs the engine's k-round labels must equal a 10-line in-memory
  * reference (min label within k undirected hops), and the converged
  * loop must induce a valid component partition. Generation is driven
  * directly through Gen with fixed seeds (scalatestplus isn't on the
  * classpath — same pattern as [[PageRankProperties]]).
  */
class ComponentsProperties extends SparkSpec {

  /** In-memory k-round HashMin: the same recurrence the oracle CTEs
    * replay — each round every vertex takes min(own, neighbors'). */
  private def reference(vs: Seq[String], es: Seq[(String, String)],
                        rounds: Int): Map[String, String] = {
    val und = (es ++ es.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var lbl = vs.map(v => v -> v).toMap
    for (_ <- 1 to rounds)
      lbl = vs.map { v =>
        val nbr = und.getOrElse(v, Nil).map(lbl)
        v -> (lbl(v) +: nbr).min
      }.toMap
    lbl
  }

  private val graphGen: Gen[(Seq[String], Seq[(String, String)])] = for {
    n <- Gen.choose(2, 40)
    pages = (0 until n).map(i => f"v$i%02d")
    m <- Gen.choose(0, 60)
    edges <- Gen.listOfN(m, for {
      s <- Gen.oneOf(pages); d <- Gen.oneOf(pages) if s != d
    } yield (s, d))
  } yield (pages, edges.distinct)

  private def samples(k: Int): Seq[(Seq[String], Seq[(String, String)])] =
    (1 to k).flatMap(i => graphGen.apply(Gen.Parameters.default, Seed(97L + i)))

  test("k-round labelPropagation equals the in-memory HashMin recurrence") {
    val s = spark
    import s.implicits._
    for (((vs, es), i) <- samples(6).zipWithIndex) {
      val rounds = 1 + i % 4
      val got = Components.labelPropagation(vs.toDF("page"),
          es.toDF("src", "dst"), rounds)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == reference(vs, es, rounds),
        s"rounds=$rounds n=${vs.size} m=${es.size}")
    }
  }

  test("star contraction equals converged HashMin on random graphs") {
    val s = spark
    import s.implicits._
    for ((vs, es) <- samples(6)) {
      val pages = vs.toDF("page")
      val edges = es.toDF("src", "dst")
      val hashMin = Components.components(pages, edges)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val stars = Components.componentsStarContraction(pages, edges)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(stars == hashMin, s"n=${vs.size} m=${es.size}")
    }
  }

  test("star contraction keeps one row per page even when rounds run out") {
    // ADVICE r4 item 2: with maxRounds exhausted before convergence a
    // vertex can hold edges to several candidate roots — the final
    // mapping must still be one deterministic row per page
    val s = spark
    import s.implicits._
    for ((vs, es) <- samples(4); rounds <- Seq(0, 1)) {
      val out = Components.componentsStarContraction(
          vs.toDF("page"), es.toDF("src", "dst"), maxRounds = rounds)
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(out.map(_._1).distinct.length == vs.size,
        s"rounds=$rounds n=${vs.size} m=${es.size}: duplicate page rows")
      assert(out.length == vs.size)
    }
  }

  test("converged components form a partition closed under edges") {
    val s = spark
    import s.implicits._
    for ((vs, es) <- samples(4)) {
      val comp = Components.components(vs.toDF("page"), es.toDF("src", "dst"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      // every vertex labeled; every edge's endpoints share a label;
      // every label is the min vertex of its class
      assert(comp.keySet == vs.toSet)
      es.foreach { case (a, b) => assert(comp(a) == comp(b), s"edge $a-$b") }
      comp.groupBy(_._2).foreach { case (lbl, members) =>
        assert(members.keys.min == lbl)
      }
    }
  }
}
