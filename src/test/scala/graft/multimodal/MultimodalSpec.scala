package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The real image-decode path (javax.imageio, JDK built-in codecs):
  * grayscale PNG round-trip losslessness is what makes q_mm_decode
  * oracle-replayable from the source bytes.
  */
class MultimodalSpec extends SparkSpec {

  test("gray PNG round-trip is lossless and trims the partial last row") {
    val bytes = Array.tabulate(100)(i => ((i * 37) % 256).toByte)
    val png = Multimodal.encodePng(bytes, 32) // 3 full rows, 4 bytes trimmed
    // a real PNG file, not a passthrough
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val dec = Multimodal.decodeMedia(png)
    assert(dec.width == 32 && dec.height == 3)
    assert(dec.pixels.toSeq == bytes.take(96).toSeq)
  }

  test("decodeMedia handles non-gray images (dims; gray conversion applied)") {
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(2, 1, 0xff8040)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val dec = Multimodal.decodeMedia(bos.toByteArray)
    assert(dec.width == 5 && dec.height == 4 && dec.pixels.length == 20)
  }

  test("decodeMedia rejects non-image payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeMedia("not a png".getBytes("UTF-8"))
    }
  }

  test("decodeStats matches hand-computed pixel stats; short payloads drop") {
    val s = spark
    import s.implicits._
    val t1 = "a" * 32 + "b" * 32 + "trimmed tail" // 2 rows + partial
    val t2 = "short"                              // < one row → filtered
    val assets = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val rows = Multimodal.decodeStats(assets, 32).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 32L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 32L * 'a' + 32L * 'b') // px_sum
    assert(r.getLong(4) == 'a'.toLong && r.getLong(5) == 'b'.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectMd5 = md.digest(("a" * 32 + "b" * 32).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getString(6) == expectMd5)
  }
  test("aHashBands: identical payloads hash identically; structure differs") {
    val s = spark
    import s.implicits._
    // 8 rows of 32 bytes: top half dark ('a'=97), bottom half light ('z')
    val split = "a" * 128 + "z" * 128
    val flat = "m" * 256 // uniform → every cell == mean → all bits 0
    val assets = Seq((1L, split), (2L, split), (3L, flat), (4L, "short"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val got = Multimodal.aHashBands(assets, 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // "short" filtered (< 8 rows)
    assert(got(1L) == got(2L)) // identical bytes → identical hash
    // split image: rows 0-3 are 'a' (< mean), rows 4-7 'z' (> mean)
    assert(got(1L) == Seq(0, 0, 0, 0, 255, 255, 255, 255))
    assert(got(3L) == Seq(0, 0, 0, 0, 0, 0, 0, 0)) // strict > keeps flat at 0
  }

  test("q_mm_phash finds exact-dup pairs at hamming 0 and skips dissimilar") {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-phash").toString
    val imgA = "a" * 128 + "z" * 128
    val imgB = "z" * 128 + "a" * 128 // complement of A: hamming 64
    Seq((1L, imgA), (2L, imgA), (3L, imgB))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = graft.queries.MultimodalQueries.queries("q_mm_phash")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 0L)))
  }

}
