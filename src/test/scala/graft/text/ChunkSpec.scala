package graft.text

import graft.{SparkEntry, SparkSpec, Tables}

/** `q_text_chunk` against a driver-side replay, plus the coverage
  * properties the chunking contract promises: fixed stride, clamped
  * tail, every token inside some chunk, full neighbors overlap by
  * size − stride tokens. */
class ChunkSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val Size = 64
  private val Stride = 48

  test("chunks, sizes and hashes match the replay; coverage holds") {
    val got = SparkEntry.queries("q_text_chunk")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getString(3))))
      .toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split("\\s+", -1)))
    val expected = docs.flatMap { case (id, toks) =>
      val n = toks.length
      val nChunks = (math.max(n - Size, 0) + Stride - 1) / Stride + 1
      (0 until nChunks).map { k =>
        val c = toks.slice(k * Stride, k * Stride + Size)
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(c.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        ((id, k), (c.length.toLong, md5))
      }
    }.toMap
    assert(got == expected)
    // coverage + overlap on a sample of full docs
    docs.take(20).foreach { case (id, toks) =>
      val n = toks.length
      val nChunks = (math.max(n - Size, 0) + Stride - 1) / Stride + 1
      assert((nChunks - 1) * Stride + Size >= n, s"doc $id: token uncovered")
      if (nChunks > 1)
        assert(Size - Stride == 16, "full neighbors overlap by 16")
    }
  }
}
