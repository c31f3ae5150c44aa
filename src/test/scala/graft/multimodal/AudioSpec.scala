package graft.multimodal

import graft.SparkSpec
import graft.queries.MultimodalQueries
import org.apache.spark.sql.functions._

/** Real WAV/PCM decode (q_mm_audio): the JDK javax.sound.sampled
  * round-trip must be byte-lossless for unsigned 8-bit PCM, and the
  * catalog query must reproduce hand-computed sample stats. */
class AudioSpec extends SparkSpec {

  test("encodeWav → decodeAudio is a lossless byte round-trip") {
    val payload = (0 until 256).map(_.toByte).toArray
    val wav = Multimodal.encodeWav(payload)
    // a real RIFF/WAV container, not the raw bytes
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val dec = Multimodal.decodeAudio(wav)
    assert(dec.sampleRate === 8000f)
    assert(dec.samples.toSeq === payload.toSeq)
  }

  test("q_mm_audio matches hand-computed PCM stats on a tiny corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "abcDEF xyz"), (2L, "Hello, WAV!"), (3L, ""))
    val dir = java.nio.file.Files.createTempDirectory("graft-audio").toString
    docs.toDF("doc_id", "text")
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = MultimodalQueries.queries("q_mm_audio")(s, dir)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    // doc 3 is empty → filtered (nothing to decode)
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    val (_, n1, sr1, sum1, mn1, mx1, md5a) = out(0)
    val t1 = "abcDEF xyz"
    assert(n1 === t1.length.toLong)
    assert(sr1 === 8000L)
    assert(sum1 === t1.map(_.toInt).sum.toLong)
    assert(mn1 === t1.map(_.toInt).min.toLong)
    assert(mx1 === t1.map(_.toInt).max.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(md5a ===
      md.digest(t1.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }
}
