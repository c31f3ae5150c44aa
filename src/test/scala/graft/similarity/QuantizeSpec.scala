package graft.similarity

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.functions.col

import graft.{SparkEntry, SparkSpec, Tables}

/** `q_embed_quantize` against a driver-side replay of int8 max-abs
  * scalar quantization on the real sf0.001 embeddings, plus the SQ8
  * invariants (code range, ±max saturation, reconstruction bound). */
class QuantizeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // Spark/DuckDB round() is HALF_UP (away from zero) — Math.round is
  // floor(x+0.5) which differs on negative .5 exactly, so replay with
  // BigDecimal
  private def code(x: Float, m: Double): Int =
    if (m <= 0.0) 0
    else new JBigDecimal(127.0 * x.toDouble / m)
      .setScale(0, RoundingMode.HALF_UP).intValueExact()

  private def vectors(): Array[(Long, Array[Float])] =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  test("scale, sums and code digest match the replay at sf0.001") {
    val got = SparkEntry.queries("q_embed_quantize")(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))))
    val ref = vectors().map { case (id, v) =>
      val m = v.map(x => math.abs(x.toDouble)).max
      val cs = v.map(code(_, m))
      id -> (
        new JBigDecimal(m).setScale(6, RoundingMode.HALF_UP).doubleValue(),
        v.length.toLong,
        cs.map(_.toLong).sum,
        cs.map(c => math.abs(c).toLong).sum,
        md5hex(cs.mkString(",")))
    }.toMap
    assert(got.length == ref.size && got.nonEmpty)
    got.foreach { case (id, g) => assert(g == ref(id), s"vec $id") }
  }

  test("SQ8 invariants: saturation at ±127 and element error ≤ scale/254") {
    vectors().foreach { case (id, v) =>
      val m = v.map(x => math.abs(x.toDouble)).max
      val cs = v.map(code(_, m))
      assert(cs.forall(c => c >= -127 && c <= 127), s"vec $id code range")
      assert(cs.map(math.abs).max == 127, s"vec $id must saturate at max")
      v.zip(cs).foreach { case (x, c) =>
        val err = math.abs(x.toDouble - c * m / 127.0)
        assert(err <= m / 254.0 + 1e-12, s"vec $id recon err $err")
      }
    }
  }
}
