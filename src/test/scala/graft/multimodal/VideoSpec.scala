package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The real video-decode path (pure-JVM Y4M / YUV4MPEG2 parser): the
  * mono-colorspace round-trip losslessness is what makes q_mm_video
  * oracle-replayable from the source bytes, and the parser must hold
  * up against the container features the spec allows (tag reorder,
  * frame-level parameters, chroma planes) — not just its own encoder's
  * output.
  */
class VideoSpec extends SparkSpec {

  private val W = 16
  private val H = 8
  private val FrameLen = W * H

  test("mono Y4M round-trip is lossless and trims the partial last frame") {
    val bytes = Array.tabulate(3 * FrameLen + 17)(i => ((i * 31) % 256).toByte)
    val y4m = Multimodal.encodeY4m(bytes, W, H)
    // a real Y4M stream, not a passthrough: magic + per-frame markers
    assert(new String(y4m.take(9), "US-ASCII") == "YUV4MPEG2")
    val dec = Multimodal.decodeY4m(y4m)
    assert(dec.width == W && dec.height == H)
    assert(dec.fpsNum == 25 && dec.fpsDen == 1)
    assert(dec.frames.length == 3) // 17-byte tail trimmed
    (0 until 3).foreach { k =>
      assert(dec.frames(k).toSeq ==
        bytes.slice(k * FrameLen, (k + 1) * FrameLen).toSeq)
    }
  }

  test("decodeY4m accepts reordered header tags and frame-level params") {
    val frame = Array.tabulate(FrameLen)(i => (i % 251).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    // tag order is not fixed by the spec; X tags are extensions;
    // FRAME may carry its own parameters up to the newline
    bos.write(s"YUV4MPEG2 F30000:1001 H$H Ip W$W Cmono Xgraft=1\n"
      .getBytes("US-ASCII"))
    bos.write("FRAME Ixyz\n".getBytes("US-ASCII"))
    bos.write(frame)
    val dec = Multimodal.decodeY4m(bos.toByteArray)
    assert(dec.width == W && dec.height == H)
    assert(dec.fpsNum == 30000 && dec.fpsDen == 1001)
    assert(dec.frames.length == 1 && dec.frames.head.toSeq == frame.toSeq)
  }

  test("decodeY4m walks 4:2:0 chroma planes and returns the luma") {
    val luma = Array.tabulate(2 * FrameLen)(i => ((i * 7) % 256).toByte)
    val chroma = new Array[Byte](2 * (FrameLen / 4)) // per frame: Cb + Cr
    java.util.Arrays.fill(chroma, 0x80.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$W H$H F25:1 C420jpeg\n".getBytes("US-ASCII"))
    (0 until 2).foreach { k =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(luma, k * FrameLen, FrameLen)
      bos.write(chroma)
    }
    val dec = Multimodal.decodeY4m(bos.toByteArray)
    assert(dec.frames.length == 2)
    (0 until 2).foreach { k =>
      assert(dec.frames(k).toSeq ==
        luma.slice(k * FrameLen, (k + 1) * FrameLen).toSeq)
    }
  }

  test("decodeY4m rejects bad magic, truncated frames, unknown colorspace") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("RIFF not a video\n".getBytes("US-ASCII"))
    }
    val ok = Multimodal.encodeY4m(new Array[Byte](FrameLen), W, H)
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m(java.util.Arrays.copyOf(ok, ok.length - 1))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("YUV4MPEG2 W16 H8 F25:1 Cwat\nFRAME\n"
        .getBytes("US-ASCII"))
    }
  }

  test("encodeY4m rejects payloads shorter than one frame") {
    intercept[IllegalArgumentException] {
      Multimodal.encodeY4m(new Array[Byte](FrameLen - 1), W, H)
    }
  }

  test("videoStats matches hand-computed per-frame stats; short drop") {
    val s = spark
    import s.implicits._
    val t1 = "a" * FrameLen + "b" * FrameLen + "tail" // 2 frames + trim
    val t2 = "short" // < one frame → filtered
    val assets = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val rows = Multimodal.videoStats(assets, W, H)
      .orderBy("doc_id", "frame_idx").collect()
    assert(rows.length == 2)
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq(('a', 0), ('b', 1)).foreach { case (ch, k) =>
      val r = rows(k)
      assert(r.getLong(0) == 1L && r.getLong(1) == k.toLong)
      assert(r.getLong(2) == W.toLong && r.getLong(3) == H.toLong)
      assert(r.getLong(4) == 2L) // n_frames: the 4-byte tail is trimmed
      assert(r.getLong(5) == FrameLen.toLong * ch) // px_sum
      assert(r.getLong(6) == ch.toLong && r.getLong(7) == ch.toLong)
      md.reset()
      val expect = md.digest((ch.toString * FrameLen).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(8) == expect)
    }
  }
}
