package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries

/** The skew guard on the blocked n-gram join (VERDICT r4 item 1): a
  * single oversized (source × length-bucket) block must NOT generate
  * O(block²) candidate pairs — oversized blocks route through 16
  * single-row minhash bands, so candidates are governed by true
  * similarity, not block size.
  */
class DedupNgramCapSpec extends SparkSpec {

  /** doc_id, source, lb, sh — the [[DedupQueries.ngramCandidates]]
    * input shape, from synthetic texts all in ONE block. */
  private def oneBlock(texts: Seq[String]) = {
    val s = spark
    import s.implicits._
    graft.GraftFunctions.register(s)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), lit("web").as("source"), lit(0L).as("lb"),
        call_function("char_shingle_hashes", col("text"), lit(5)).as("sh"))
  }

  private def randomTexts(n: Int, len: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // random lowercase strings: 5-gram shingle space is 26^5 ≈ 12M, so
    // dissimilar docs share essentially no shingles
    Seq.fill(n)(Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString)
  }

  test("a 10k-doc skewed block of dissimilar docs yields bounded candidates") {
    val n = 10000
    val sh = oneBlock(randomTexts(n, 60, seed = 7)).localCheckpoint(true)
    val cand = DedupQueries.ngramCandidates(sh, blockCap = 64).count()
    val allPairs = n.toLong * (n - 1) / 2 // ≈ 50M under plain blocking
    // banding collisions on random text are rare: orders of magnitude
    // below all-pairs (observed ~0 at seed 7)
    assert(cand < allPairs / 100,
      s"skewed block generated $cand candidates (all-pairs would be $allPairs)")
  }

  test("banded route still surfaces true near-dups inside an oversized block") {
    val base = randomTexts(40, 60, seed = 11)
    // 40 dissimilar docs + 10 copies of doc 0 with a 1-char edit
    val texts = base ++ (1 to 10).map(i => base.head.updated(i, 'z'))
    val sh = oneBlock(texts).localCheckpoint(true)
    val cand = DedupQueries.ngramCandidates(sh, blockCap = 8)
    // every (copy, copy) and (orig, copy) pair shares nearly all
    // shingles → J ≈ 1 → caught by banding with overwhelming probability
    val dupIds = (0L +: (40L until 50L)).toSet
    val dupPairs = cand.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .count { case (a, b) => dupIds(a) && dupIds(b) }
    assert(dupPairs >= 50, s"expected ≥ 50 of 55 near-dup pairs, got $dupPairs")
  }

  test("under the cap the candidate set equals plain within-block all-pairs") {
    val sh = oneBlock(randomTexts(30, 60, seed = 3)).localCheckpoint(true)
    assert(DedupQueries.ngramCandidates(sh, blockCap = 1000).count() == 30L * 29 / 2)
  }

  test("editdist: an oversized shared-prefix block refines to 8-char blocks") {
    // 2000 docs, all sharing the same 4-char boilerplate opening ("The ")
    // but diverse after it: one (lb × pb4) block of 2000 → ~2M pairs
    // under plain blocking; the cap routes it through pb8, whose blocks
    // are tiny for diverse continuations
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val p = Seq.fill(2000)(
        "The " + Array.fill(56)(('a' + rnd.nextInt(26)).toChar).mkString)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("pre"),
        lit(1L).as("lb"), substring(col("text"), 1, 4).as("pb"),
        substring(col("text"), 1, 8).as("pb8"))
    val n = 2000L
    val capped = DedupQueries.editdistCandidates(p, blockCap = 64).count()
    // the DP runs on candidates only; plain pb4 blocking would generate
    // ~2M pairs, pb8 refinement collapses it (26^4 continuations ⇒
    // expected block size ~1)
    assert(capped < n * (n - 1) / 2 / 100,
      s"expected pb8 refinement to debulk the shared-prefix block, got $capped")
  }
}
