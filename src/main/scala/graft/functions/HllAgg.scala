package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) over a
  * 60-bit md5-derived hash — the constant-width companion to
  * [[KMVAgg]]: where KMV keeps the k smallest hashes (k longs), HLL
  * keeps one byte per bucket (m = 2^p bytes TOTAL, independent of both
  * k and the distinct count), the register form every warehouse's
  * approx_count_distinct ships.
  *
  * Determinism contract (the KMV philosophy): the input is the
  * 60-bit `conv(substring(md5(x), 1, 15), 16, 10)` hash, bucket =
  * low p bits, and rho = 53 − bitlength(h >>> p) (the leading-zero
  * rank of the remaining 52-bit window, 53 when the window is zero) —
  * all integer functions of the DATA, so the register array (and any
  * estimate derived from it by a fixed float expression) is replicated
  * exactly by a DuckDB oracle: per-bucket MAX over
  * `53 - length(bin(w))`, missing buckets 0.
  *
  * Mergeable: merge = elementwise max, so Spark runs partial+final and
  * exactly m bytes per group per partition cross the shuffle — the
  * 100 TB distinct-count envelope. Null inputs carry no information.
  * The estimate itself (alpha·m²/Σ2^−reg + linear-counting fallback)
  * is left to the CALLER's column expression so both engines share one
  * float path (see q_distinct_hll).
  */
class HllAgg(p: Int)
    extends Aggregator[java.lang.Long, Array[Byte], Seq[Int]] {
  require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")

  private val m = 1 << p

  /** Width of the rank window above the p bucket bits: the hash is
    * < 2^60 (15 md5 hex chars), so h >>> p is < 2^(60−p). */
  private val windowBits = 60 - p

  /** rho = leading zeros of the window + 1 = (windowBits − bitlength)
    * + 1; an all-zero window scores windowBits + 1 (p = 8: the 53 the
    * q_distinct_hll oracle replays as 53 − length(bin(w))). */
  private def rho(w: Long): Int =
    if (w == 0L) windowBits + 1
    else windowBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], input: java.lang.Long): Array[Byte] = {
    if (input == null) return buf
    val h = input.longValue()
    val b = (h & (m - 1)).toInt
    val r = rho(h >>> p)
    if (r > buf(b)) buf(b) = r.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Byte]): Seq[Int] = buf.map(_.toInt).toSeq

  override def bufferEncoder: Encoder[Array[Byte]] =
    ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Seq[Int]] =
    ExpressionEncoder[Seq[Int]]()
}
