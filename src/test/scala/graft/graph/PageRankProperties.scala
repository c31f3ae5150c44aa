package graft.graph

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants of the reference-convention PageRank
  * (SURVEY.md §5.2): mass conservation bounds and vertex-relabeling
  * invariance, on ScalaCheck-generated random graphs (sampled with a
  * fixed seed — scalatestplus isn't on the classpath, so generation is
  * driven directly through Gen). */
class PageRankProperties extends SparkSpec {

  private val graphGen: Gen[(Seq[String], Seq[(String, String)])] = for {
    n <- Gen.choose(2, 12)
    pages = (0 until n).map(i => s"v$i")
    m <- Gen.choose(0, n * 2)
    edges <- Gen.listOfN(m, for {
      s <- Gen.oneOf(pages); d <- Gen.oneOf(pages) if s != d
    } yield (s, d))
  } yield (pages, edges.distinct)

  private def samples(k: Int): Seq[(Seq[String], Seq[(String, String)])] =
    (1 to k).flatMap(i => graphGen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def ranks(pages: Seq[String], edges: Seq[(String, String)]) = {
    val s = spark
    import s.implicits._
    PageRank.run(pages.toDF("page"), edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("total rank stays within (0, 1]: teleport floor to full mass") {
    for ((pages, edges) <- samples(5)) {
      val r = ranks(pages, edges)
      val total = r.values.sum
      // ≤ 1 + fp slack: mass only decays (dangling loss, never created);
      // ≥ n·0.15/n = 0.15: every page keeps its teleport share
      assert(total <= 1.0 + 1e-9, s"total=$total edges=$edges")
      assert(total >= 0.15 - 1e-9, s"total=$total edges=$edges")
      r.values.foreach(v => assert(v >= 0.15 / pages.size - 1e-12))
    }
  }

  test("redistributeDangling conserves total mass ≡ 1 on every graph") {
    val s = spark
    import s.implicits._
    for ((pages, edges) <- samples(5)) {
      val r = PageRank.run(pages.toDF("page"), edges.toDF("src", "dst"),
          iters = 4, redistributeDangling = true)
        .collect().map(_.getDouble(1))
      val total = r.sum
      assert(math.abs(total - 1.0) < 1e-9, s"total=$total edges=$edges")
    }
    // and with NO edges at all (every page dangling) it still holds
    val allDangling = PageRank.run(Seq("a", "b", "c").toDF("page"),
        Seq.empty[(String, String)].toDF("src", "dst"),
        iters = 4, redistributeDangling = true)
      .collect().map(_.getDouble(1))
    assert(math.abs(allDangling.sum - 1.0) < 1e-12)
  }

  test("GraphX normalized=true restores total mass ≡ 1") {
    val s = spark
    import s.implicits._
    for ((pages, edges) <- samples(3)) {
      val r = PageRankGraphX.run(pages.toDF("page"), edges.toDF("src", "dst"),
          iters = 4, normalized = true)
        .collect().map(_.getDouble(1))
      assert(math.abs(r.sum - 1.0) < 1e-9, s"total=${r.sum} edges=$edges")
    }
  }

  test("rank is invariant under vertex relabeling") {
    for ((pages, edges) <- samples(3)) {
      val perm = new scala.util.Random(7).shuffle(pages.toList)
      val rename = pages.zip(perm).toMap
      val r1 = ranks(pages, edges)
      val r2 = ranks(pages.map(rename),
        edges.map { case (s, d) => (rename(s), rename(d)) })
      pages.foreach { p =>
        assert(math.abs(r1(p) - r2(rename(p))) < 1e-12,
          s"page=$p r1=${r1(p)} r2=${r2(rename(p))}")
      }
    }
  }
}
