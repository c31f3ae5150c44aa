package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002): keep
  * the k smallest DISTINCT hash values seen; if the kth-smallest of a
  * uniform 32-bit hash is m, the stream had ≈ (k−1)·2³²/m distinct
  * values.
  *
  * Why this is the scale-right distinct count: exact countDistinct
  * shuffles every distinct value per group; this Aggregator is MERGEABLE
  * (merge = sorted-merge of two sketches, keep k smallest) so Spark runs
  * it partial+final and only ≤ k longs per group per partition cross the
  * shuffle — same cost envelope as HyperLogLog but, because the input is
  * an md5-derived hash32 column, the sketch (and therefore the estimate)
  * is a deterministic function of the data that a DuckDB oracle
  * replicates exactly: the k smallest distinct hashes are the first k
  * elements of `list_sort(list_distinct(list(h)))`.
  *
  * Null inputs carry no information. Buffer and output are
  * ascending-sorted distinct arrays of ≤ k hashes; groups with fewer
  * than k distinct values return their full (exact) hash set.
  */
class KMVAgg(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], input: java.lang.Long): Array[Long] = {
    if (input == null) return buf
    val h = input.longValue()
    val n = buf.length
    if (n == k && h >= buf(n - 1)) return buf // can't enter the sketch
    val pos = java.util.Arrays.binarySearch(buf, 0, n, h)
    if (pos >= 0) return buf // already present
    val ins = -pos - 1
    val outLen = math.min(n + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var w = 0
    while (w < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (w == 0 || out(w - 1) != v) { out(w) = v; w += 1 }
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
