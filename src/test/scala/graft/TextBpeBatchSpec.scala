package graft

import org.apache.spark.sql.DataFrame

import graft.queries.TextQueries

/** The merges-per-job batching rule ([[TextQueries.selectMergeBatch]])
  * against its correctness contract: a batch is admitted ONLY when it
  * provably equals the one-at-a-time sequential argmax. The naive
  * "skip interacting pairs and keep selecting" rule does NOT have that
  * property, and neither did r15's pure symbol-name-disjointness rule
  * (ADVICE r15 high) — replace() acts on the raw SEP-joined string, so
  * three counterexample classes break name-level reasoning:
  *  1. self-pair creation: merging (a,a) creates (aa,a)/(aa,aa) pairs
  *     bounded by the selection's OWN count, not the stopper's;
  *  2. concat-name collision: a merge's product a+b can collide with a
  *     symbol that already exists (or that another merge creates),
  *     inflating that symbol's pair counts mid-batch;
  *  3. misaligned replace: the pattern a·b· matches where a is merely
  *     a SUFFIX of a longer symbol ("ab·d·" → "abd·" under merge
  *     (b,d)), consuming symbols name-disjointness never tracked.
  * Each class is pinned below, plus a fuzz harness that replays the
  * exact engine semantics (split-based pair counts, (cnt DESC, a, b)
  * argmax, top-(M+1) collect, leftmost non-overlapping replace) over
  * deterministic random vocabularies through the REAL selection rule.
  */
class TextBpeBatchSpec extends SparkSpec {

  private val SEP = graft.functions.BpeSymbolsUtil.Sep.toString

  private def train(df: DataFrame, k: Int, m: Int) =
    TextQueries.bpeTrainLoop(TextQueries.wordSymVocab(df), k, m)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  // ---- an exact in-process model of the engine's training loop ----
  // (plain collections — the fuzz must cover ~10^4 vocabularies, which
  // Spark jobs cannot; BpeSpTrainSpec separately pins that the Spark
  // loop and a local loop agree, so this model stands for the engine)

  private def explodeWord(w: String): String =
    w.map(_.toString + SEP).mkString

  private def countPairs(vocab: Seq[(String, Long)])
      : Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((sym, c) <- vocab) {
      val ss = sym.split(SEP.charAt(0)).filter(_.nonEmpty)
      var i = 0
      while (i < ss.length - 1) {
        val k = (ss(i), ss(i + 1))
        m(k) = m.getOrElse(k, 0L) + c
        i += 1
      }
    }
    m.toMap
  }

  private def rankedPairs(vocab: Seq[(String, Long)], limit: Int)
      : Seq[(String, String, Long)] =
    countPairs(vocab).toSeq
      .map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }
      .take(limit)

  private def applyMerge(vocab: Seq[(String, Long)], a: String, b: String)
      : Seq[(String, Long)] =
    vocab.map { case (sym, c) =>
      (sym.replace(a + SEP + b + SEP, a + b + SEP), c)
    }

  private def sequentialModel(vocab0: Seq[(String, Long)], k: Int)
      : Seq[(String, String, Long)] = {
    var v = vocab0
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < k && !done) {
      val top = rankedPairs(v, 1)
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = top.head
        v = applyMerge(v, a, b)
        out += ((a, b, c))
        r += 1
      }
    }
    out.result()
  }

  private def batchedModel(vocab0: Seq[(String, Long)], k: Int, m: Int,
      universe0: Set[String]): Seq[(String, String, Long)] = {
    var v = vocab0
    val uni = scala.collection.mutable.Set(universe0.toSeq: _*)
    val out = scala.collection.mutable.Buffer.empty[(String, String, Long)]
    var done = false
    while (out.size < k && !done) {
      val top = rankedPairs(v, m + 1)
      if (top.isEmpty) done = true
      else for ((a, b, c) <- TextQueries.selectMergeBatch(
          top, math.min(m, k - out.size), uni)) {
        v = applyMerge(v, a, b)
        out += ((a, b, c))
        TextQueries.universeAfterMerge(uni, a, b)
      }
    }
    out.toSeq
  }

  private def fuzzOne(rng: scala.util.Random): Option[String] = {
    val alpha = "abcd".take(2 + rng.nextInt(3))
    val words = scala.collection.mutable.Map.empty[String, Long]
    for (_ <- 0 until (2 + rng.nextInt(5)))
      words(Seq.fill(1 + rng.nextInt(6))(
        alpha(rng.nextInt(alpha.length))).mkString) =
        (1 + rng.nextInt(4)).toLong
    val vocab = words.toSeq.sortBy(_._1)
      .map { case (w, c) => (explodeWord(w), c) }
    val uni = words.keys.flatMap(_.toSeq).map(_.toString).toSet
    val k = 1 + rng.nextInt(8)
    val m = Seq(2, 3, 4, 8, 16)(rng.nextInt(5))
    val seq = sequentialModel(vocab, k)
    val bat = batchedModel(vocab, k, m, uni)
    if (seq == bat) None
    else Some(s"words=$words k=$k m=$m\n  seq=$seq\n  bat=$bat")
  }

  test("fuzz: guarded batch == sequential argmax over 20k random " +
      "vocabularies under exact engine semantics (the r15 rule " +
      "diverged ~1 in 200 on this generator)") {
    val rng = new scala.util.Random(16L)
    val bad = (0 until 20000).iterator.flatMap(_ => fuzzOne(rng)).take(1)
    assert(bad.isEmpty, bad.mkString)
  }

  test("counterexample 1 (self-pair creation): ADVICE r15's vocab " +
      "{aaa x4, adcda x2, cd x2} — sequential learns (a,a),(aa,a)," +
      "(c,d); the r15 batch learned (a,a),(c,d),(aa,a)") {
    val vocab = Seq("aaa" -> 4L, "adcda" -> 2L, "cd" -> 2L)
      .map { case (w, c) => (explodeWord(w), c) }
    val uni = Set("a", "c", "d")
    val seq = sequentialModel(vocab, 3)
    assert(seq.map(t => (t._1, t._2)) ==
      Seq(("a", "a"), ("aa", "a"), ("c", "d")),
      "counterexample lost its teeth: sequential order changed")
    assert(batchedModel(vocab, 3, 16, uni) == seq)
  }

  test("counterexample 3 (misaligned replace): after (b,c)→bc, the " +
      "pattern c·a· matches inside bc·a· (bc ENDS with c), fusing " +
      "[bc,a] and shifting counts of the name-disjoint (b,bc) — the " +
      "r15 rule batched {(c,a),(b,bc)} and learned the wrong rule 3") {
    val vocab = Seq("cca" -> 2L, "acab" -> 3L, "bb" -> 3L,
      "bccbbc" -> 2L, "a" -> 1L, "bbcabc" -> 2L)
      .map { case (w, c) => (explodeWord(w), c) }
    val uni = Set("a", "b", "c")
    val seq = sequentialModel(vocab, 3)
    assert(seq.map(t => (t._1, t._2)) ==
      Seq(("b", "c"), ("c", "a"), ("a", "ca")),
      "counterexample lost its teeth: sequential order changed " +
        "(the r15 rule learned (b,bc) as rule 3 here)")
    for (m <- Seq(2, 4, 16))
      assert(batchedModel(vocab, 3, m, uni) == seq, s"m=$m")
  }

  test("counterexample 2 (concat-name collision): a merge whose " +
      "product suffix-collides with an existing symbol name admits " +
      "no followers (universe guard closes the batch)") {
    // with "ab" in the universe, candidate (a,b)'s creations would
    // inflate (w,ab) counts — (a,b) is admitted but nothing after it
    val ranked = Seq(("a", "b", 9L), ("c", "d", 7L))
    val got = TextQueries.selectMergeBatch(ranked, 8, Set("a", "b", "ab"))
    assert(got == Seq(("a", "b", 9L)),
      "expected the universe guard to close the batch after (a,b)")
  }

  test("admit-and-close: a deferred-hazard merge batches as the FINAL " +
      "merge — earlier clean selections are kept, later ones are not") {
    // "ab" ∈ universe makes (a,b) a deferred hazard; it ranks second,
    // so the batch keeps the clean (c,d) AND the hazard (a,b), then
    // closes — (e,f) never enters. A hard-stop rule would have lost
    // (a,b) to the stopper.
    val ranked = Seq(("c", "d", 9L), ("a", "b", 8L), ("e", "f", 7L))
    val got = TextQueries.selectMergeBatch(ranked, 8,
      Set("a", "b", "c", "d", "e", "f", "ab"))
    assert(got == Seq(("c", "d", 9L), ("a", "b", 8L)))
  }

  test("batch selection: disjoint distinct-count pairs are all admitted") {
    val ranked = Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 5L))
    val uni = Set("a", "b", "c", "d", "e", "f")
    assert(TextQueries.selectMergeBatch(ranked, 8, uni) == ranked)
  }

  test("batch selection: an interacting pair stops the batch and the " +
      "tie guard drops same-count selections (fallback = the argmax)") {
    // (e,c) interacts with (c,d) -> stop with stopCnt = 9; both
    // selections tie the stopper, so the strict guard empties the
    // batch and the fallback keeps exactly the sequential argmax
    val ranked = Seq(("a", "b", 9L), ("c", "d", 9L), ("e", "c", 9L))
    val uni = Set("a", "b", "c", "d", "e")
    assert(TextQueries.selectMergeBatch(ranked, 8, uni) ==
      Seq(("a", "b", 9L)))
  }

  test("the naive skip-and-continue batch diverges from sequential; " +
      "the guarded batch does not") {
    val s = spark
    import s.implicits._
    // corpus: words "abc" x3 and "de" x3. Initial pair counts all tie
    // at 3: ranked = (a,b), (b,c), (d,e). Sequential: merge (a,b),
    // after which (ab,c) [count 3, "ab" < "d"] outranks (d,e) — the
    // pair the merge CREATED wins the tie-break. The naive rule would
    // have batched {(a,b), (d,e)} and learned (d,e) as rule 2.
    val docs = Seq.fill(3)("abc de").toDF("text")
    val sequential = train(docs, 3, 1)
    val batched = train(docs, 3, 8)
    assert(sequential.map(t => (t._2, t._3)) ==
      Seq(("a", "b"), ("ab", "c"), ("d", "e")))
    assert(batched == sequential)
    val naiveOrder = Seq(("a", "b"), ("d", "e"), ("ab", "c"))
    assert(sequential.map(t => (t._2, t._3)) != naiveOrder,
      "counterexample lost its teeth: naive order became sequential")
  }

  test("batched loop == sequential loop on the sp stream (interacting " +
      "natural-text pairs, K past several batch boundaries)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sp = TextQueries.spSymVocab(docs)
    val seq = TextQueries.bpeTrainLoop(sp, 24, 1).collect().toSeq
    val bat = TextQueries.bpeTrainLoop(sp, 24, TextQueries.BpeBatchM)
      .collect().toSeq
    assert(bat == seq)
  }
}
