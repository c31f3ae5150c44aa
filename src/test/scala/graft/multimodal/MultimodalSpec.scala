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
}
