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

    // Frame sampling: 64-byte frames, every 4th kept — the
    // video-decode-and-sample plumbing with byte slices standing in for
    // frames (the oracle replays it on the text since the corpus is
    // ASCII: byte == char).
    "q_mm_frames" -> ((s, d) => {
      Multimodal.frameSample(Multimodal.assets(s, d), 64, 4)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("frame_len").cast("long").as("frame_len"), col("frame_md5"))
        .orderBy(col("doc_id"), col("frame_idx"))
    })
  )

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
         FROM f ORDER BY doc_id, frame_idx"""
  )
}
