package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, and per-partition batch feature extraction — the shape a
  * 100 TB image/audio/video pipeline needs, with the actual media
  * decode stubbed (no codec libraries in this container; the
  * deterministic byte-level featurizer below is the stand-in and is
  * itself a real, testable computation).
  *
  * Design notes for the real thing at scale:
  *   - payloads stay `binary` columns in parquet — Spark never
  *     interprets them; column pruning means metadata-only queries
  *     never read the bytes.
  *   - decode/feature-extract runs in `Dataset.mapPartitions` (the
  *     Scala analogue of `mapInPandas`): one decoder instance per
  *     partition (amortized init — the reference's
  *     per-record DocumentBuilderFactory at PageRank.java:63-67 is the
  *     anti-pattern), rows streamed through it in batch.
  *   - partition sizing: media rows are fat, so
  *     `spark.sql.files.maxPartitionBytes` governs decode batch memory,
  *     not row counts.
  */
object Multimodal {

  /** Per-record features a decoder would emit. */
  final case class AssetFeatures(
      doc_id: Long, n_bytes: Long, digest: String, hist: Array[Long])

  /** The plug point for a real decoder (image/audio/video → tensors).
    * Deliberately unimplemented: codec libraries are absent here; the
    * pipeline uses [[byteHistogram]] as the deterministic stand-in. */
  def decodeMedia(bytes: Array[Byte]): Nothing =
    throw new NotImplementedError(
      "media codecs unavailable in this environment — see byteHistogram stub")

  /** Deterministic stand-in featurizer: 16-bucket histogram of the
    * payload's byte values (bucket = byte >> 4). */
  def byteHistogram(bytes: Array[Byte]): Array[Long] = {
    val h = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    h
  }

  /** The asset table: binary payload + typed metadata struct. Payload
    * is the document's utf-8 bytes standing in for media bytes. */
  def assets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Frame sampling over binary payloads — the video-pipeline shape:
    * chunk each payload into fixed-size "frames" (byte slices standing
    * in for decoded frames) and keep every `every`-th one. Pure
    * expressions: a generated index sequence filtered BEFORE the
    * explode, so skipped frames are never materialized — at 100 TB the
    * generate output is corpus_bytes/(frameBytes·every) rows, not
    * corpus_bytes/frameBytes. The byte slicing itself is
    * `substring(payload, …)` on the binary column (no decode, no copy
    * amplification beyond the kept frames).
    */
  def frameSample(assets: DataFrame, frameBytes: Int, every: Int): DataFrame =
    assets
      .select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes"))
      .withColumn("frame_idx", explode(expr(
        s"""IF(n_bytes > 0,
              filter(sequence(0, cast(ceil(n_bytes / $frameBytes.0) as int) - 1),
                     i -> i % $every = 0),
              array())""")))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"length(substring(payload, frame_idx * $frameBytes + 1, $frameBytes))")
          .as("frame_len"),
        expr(s"md5(substring(payload, frame_idx * $frameBytes + 1, $frameBytes))")
          .as("frame_md5"))

  /** Resize stand-in — the image-pipeline shape: view the payload as a
    * `width`-byte-per-row grid and 2×2 average-pool it (floor division,
    * partial rows/columns trimmed), exactly what a decoder's downscale
    * would do to pixel data. Pure integer arithmetic on the byte values
    * so the oracle replays it bit-for-bit; runs as a single generated
    * projection per row (no shuffle, no UDF).
    *
    * @return doc_id, out_h × out_w pooled dims, and the pooled grid's
    *         checksum (sum of pooled values) — the verifiable digest of
    *         the "resized image".
    */
  def resizePooled(assets: DataFrame, width: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val h = bytes.length / width // full rows only
        val outH = h / 2
        val outW = width / 2
        var sum = 0L
        var i = 0
        while (i < outH) {
          var j = 0
          while (j < outW) {
            val base = (2 * i) * width + 2 * j
            val p = ((bytes(base) & 0xff) + (bytes(base + 1) & 0xff) +
              (bytes(base + width) & 0xff) + (bytes(base + width + 1) & 0xff)) / 4
            sum += p
            j += 1
          }
          i += 1
        }
        (id, outH.toLong, outW.toLong, sum)
      }
      .toDF("doc_id", "out_h", "out_w", "pooled_sum")
  }

  /** Batch feature extraction over the binary payloads: one digest
    * instance per partition, rows streamed through. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          md.reset()
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          AssetFeatures(id, bytes.length.toLong, digest, byteHistogram(bytes))
        }
      }
      .toDF()
  }
}
