package graft.graph

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** `PageRank.run(weightCol = …)`: w = 1 bit-equality with the reference
  * COUNT path, a hand-computed weighted closed form, and weight
  * invariance under scaling. */
class WeightedPageRankSpec extends SparkSpec {

  import spark.implicits._

  // c1 cites s1 (w=3) and s2 (w=1); c2 cites s2 (w=2). Suppliers dangle.
  private val pages = Seq("c1", "c2", "s1", "s2").toDF("page")
  private val wedges =
    Seq(("c1", "s1", 3L), ("c1", "s2", 1L), ("c2", "s2", 2L))
      .toDF("src", "dst", "w")

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("w = 1 everywhere is BIT-equal to the unweighted reference path") {
    val ones = wedges.withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val unweighted = ranksOf(
      PageRank.run(pages, ones.select("src", "dst"), iters = 8))
    val weighted = ranksOf(
      PageRank.run(pages, ones, iters = 8, weightCol = Some("w")))
    assert(weighted == unweighted) // exact ==, not tolerance
  }

  test("one weighted iteration matches the hand recurrence") {
    // r0 = 1/4 each. deg(c1) = 4, deg(c2) = 2.
    // r1(s1) = 0.15/4 + 0.85 * (1/4 · 3/4)          = 0.0375 + 0.159375
    // r1(s2) = 0.15/4 + 0.85 * (1/4 · 1/4 + 1/4 · 1) = 0.0375 + 0.265625
    // r1(c1) = r1(c2) = 0.15/4 (no in-links)
    val got = ranksOf(
      PageRank.run(pages, wedges, iters = 1, weightCol = Some("w")))
    assert(math.abs(got("s1") - (0.0375 + 0.85 * (0.25 * 3.0 / 4.0))) < 1e-15)
    assert(math.abs(got("s2") -
      (0.0375 + 0.85 * (0.25 * 1.0 / 4.0 + 0.25 * 1.0))) < 1e-15)
    assert(math.abs(got("c1") - 0.0375) < 1e-15)
    assert(math.abs(got("c2") - 0.0375) < 1e-15)
  }

  test("ranks are invariant under uniform weight scaling") {
    val scaled = wedges.withColumn("w", col("w") * 7L)
    val a = ranksOf(PageRank.run(pages, wedges, iters = 8,
      weightCol = Some("w")))
    val b = ranksOf(PageRank.run(pages, scaled, iters = 8,
      weightCol = Some("w")))
    a.foreach { case (p, r) => assert(math.abs(r - b(p)) < 1e-12, p) }
  }

  test("weighted skew moves rank toward the heavier edge") {
    val got = ranksOf(
      PageRank.run(pages, wedges, iters = 8, weightCol = Some("w")))
    // s2 receives c2's whole split plus a quarter of c1's; s1 gets 3/4
    // of c1's — with equal dangling suppliers, s2 must outrank nothing
    // changes that ordering across iterations
    assert(got("s2") > got("s1"))
    assert(got("s1") > got("c1"))
  }

  // ---- weighted × personalized composition (VERDICT r12 item 7) ----
  // The two knobs are orthogonal by construction — weightCol changes
  // only HOW a source's rank splits across its out-edges (rank·w/Σw),
  // teleportTo changes only WHERE teleport mass lands — so their
  // composition is the standard weighted personalized PageRank. These
  // cases pin that reading so a future edit can't silently change it.

  test("weighted × personalized, w = 1: BIT-equal to plain personalized") {
    val ones = wedges.withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val plain = ranksOf(PageRank.run(pages, ones.select("src", "dst"),
      iters = 8, teleportTo = Some("c1")))
    val composed = ranksOf(PageRank.run(pages, ones, iters = 8,
      weightCol = Some("w"), teleportTo = Some("c1")))
    assert(composed == plain) // exact ==, not tolerance
  }

  test("weighted × personalized, one iteration matches the hand recurrence") {
    // r0 = [c1] indicator. deg(c1) = 4 (Σw), deg(c2) = 2.
    // r1(s1) = 0.85 · (1 · 3/4)            (teleport lands on c1 only)
    // r1(s2) = 0.85 · (1 · 1/4)            (c2 holds no rank at r0)
    // r1(c1) = 0.15 (the whole teleport), r1(c2) = 0
    val got = ranksOf(PageRank.run(pages, wedges, iters = 1,
      weightCol = Some("w"), teleportTo = Some("c1")))
    assert(math.abs(got("s1") - 0.85 * (3.0 / 4.0)) < 1e-15)
    assert(math.abs(got("s2") - 0.85 * (1.0 / 4.0)) < 1e-15)
    assert(math.abs(got("c1") - 0.15) < 1e-15)
    assert(math.abs(got("c2") - 0.0) < 1e-15)
  }
}
