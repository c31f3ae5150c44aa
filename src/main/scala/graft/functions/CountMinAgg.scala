package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch (Cormode-Muthukrishnan 2005) over md5-hash32 token
  * values — the mergeable frequency sketch behind heavy-hitter queries:
  * `estimate(x) = min_j counters[j][h_j(x)]` never under-counts and
  * over-counts by ≤ εN with probability 1−δ (ε = e/w, δ = e^−d).
  *
  * Why this is the scale-right frequency table: an exact per-token
  * count shuffles the full vocabulary per group; this Aggregator is
  * MERGEABLE (merge = element-wise counter add) so Spark runs it
  * partial+final and exactly d·w longs per group per partition cross
  * the shuffle — independent of corpus size or vocabulary.
  *
  * Determinism for the oracle: rows use the same affine universal-hash
  * family as [[ShingleHashUtil.minhashSig]] —
  * `h_j(x) = (((2j+1)·x + j·2654435761) mod 2³²) mod w` over the
  * md5-derived hash32 of the token — so a DuckDB oracle rebuilds the
  * identical counter matrix and estimates with plain integer GROUP BYs.
  *
  * Buffer/output layout: row-major Array[Long] of length d·w
  * (counter (j, b) at j·w + b). Null inputs carry no information.
  */
class CountMinAgg(d: Int, w: Int)
    extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
  require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], input: java.lang.Long): Array[Long] = {
    if (input == null) return buf
    val x = input.longValue()
    var j = 0
    while (j < d) {
      buf(j * w + CountMinAgg.bucket(x, j, w)) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object CountMinAgg {
  /** Row-j bucket of hash32 value x — all operands < 2⁶³, no overflow;
    * identical arithmetic to the minhash affine family. */
  def bucket(x: Long, j: Int, w: Int): Int =
    ((((2L * j + 1) * x + j * 2654435761L) % 4294967296L) % w).toInt
}
