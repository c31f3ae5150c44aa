package graft

import org.apache.spark.sql.DataFrame

import graft.queries.TextQueries

/** The merges-per-job batching rule ([[TextQueries.selectMergeBatch]])
  * against its correctness contract: a batch is admitted ONLY when it
  * provably equals the one-at-a-time sequential argmax. The naive
  * "skip interacting pairs and keep selecting" rule does NOT have that
  * property — a merge can create or tie-shift a pair that outranks a
  * later selection — and this spec pins the exact counterexample. */
class TextBpeBatchSpec extends SparkSpec {

  private def train(df: DataFrame, k: Int, m: Int) =
    TextQueries.bpeTrainLoop(TextQueries.wordSymVocab(df), k, m)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("batch selection: disjoint distinct-count pairs are all admitted") {
    val ranked = Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 5L))
    assert(TextQueries.selectMergeBatch(ranked, 8) == ranked)
  }

  test("batch selection: an interacting pair stops the batch and the " +
      "tie guard drops same-count selections (fallback = the argmax)") {
    // (e,c) interacts with (c,d) -> stop with stopCnt = 9; both
    // selections tie the stopper, so the strict guard empties the
    // batch and the fallback keeps exactly the sequential argmax
    val ranked = Seq(("a", "b", 9L), ("c", "d", 9L), ("e", "c", 9L))
    assert(TextQueries.selectMergeBatch(ranked, 8) == Seq(("a", "b", 9L)))
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
