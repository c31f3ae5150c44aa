package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Streaming incremental dedup — the ingest-time shape of
  * q_dedup_incremental (reference: the batch 13-job pipeline,
  * PageRank.java:422-498, has no streaming story; this is the
  * extension surface): documents arrive as a STREAM (a dump being
  * crawled), each is sketched in-flight with the exact q_dedup_lsh
  * sketch (word-3-gram shingles → 16-perm MinHash → 4×4 banding,
  * one shared definition with the batch path so the sketches can
  * never drift), and band rows stream-static join against the
  * PERSISTED bucketed signature store of the standing corpus
  * ([[graft.queries.DedupQueries.signatureStore]]).
  *
  * Scale design (100 TB standing corpus): the streaming side is only
  * the in-flight micro-batch — narrow sketch, no history. The static
  * side is the bucketed store: the join probes bucket-local store
  * partitions per micro-batch and the standing corpus's text is never
  * re-read or re-sketched (the store IS the only copy the dedup path
  * touches). Emitted state: `dropDuplicates(a, b)` keeps one key per
  * EMITTED pair — bounded by output size, not input size; a
  * production deployment scopes that state per dump (drop it when the
  * dump's ingest finishes) or watermarkes on an ingest-time column.
  */
object DedupStreams {

  /** Verified cross-pairs (new-dump doc × standing-corpus doc, exact
    * Jaccard ≥ `tau`) from a streaming `newDocs(doc_id, text)` against
    * the static banded signature store `store(doc_id, hs, band, bkey)`.
    *
    * Every band collision of a true pair recomputes the SAME exact
    * Jaccard (a function of the two `hs` sketches alone), so
    * first-seen dedup on (a, b) is order- and chunking-invariant:
    * the emitted set is exactly the distinct verified pairs.
    */
  def incDedupStream(newDocs: DataFrame, store: DataFrame,
      tau: Double = 0.5): DataFrame = {
    // literally the batch sketch ([[graft.queries.DedupQueries
    // .bandedSigs]]) applied to the streaming frame — ONE definition,
    // so the stream can never join drifted signatures against the
    // store (drift here is silent: band keys just stop colliding)
    val banded = graft.queries.DedupQueries.bandedSigs(newDocs)
    banded.as("x").join(store.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b"),
        Dedup.jaccardSorted(col("x.hs"), col("y.hs")).as("jaccard"))
      .filter(col("jaccard") >= tau)
      .dropDuplicates("a", "b")
  }
}
