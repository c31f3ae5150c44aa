package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator merging per-row MinHash signatures into a group
  * sketch by element-wise min — the UDAF surface of the engine
  * (SURVEY.md §2 "UDF/UDAF/UDTF": custom Aggregators are only needed
  * for sketches; this is that case).
  *
  * Why this is the right aggregation shape at 100 TB: MinHash is a
  * MERGEABLE sketch — min is associative/commutative with identity
  * +∞ — so Spark runs it as partial (map-side) + final aggregation,
  * shuffling one fixed-width array per group per partition instead of
  * the group's documents. The merged signature estimates the Jaccard
  * similarity of the groups' shingle-set UNIONS, e.g. source-level
  * near-dup screening before any document-level comparison.
  *
  * Null/empty/short rows (documents too short to shingle, or a
  * signature built with fewer perms than this aggregator) carry no
  * information and leave the buffer unchanged — a short row would
  * otherwise throw IndexOutOfBoundsException mid-aggregation
  * (ADVICE r2 item 5).
  */
class MinHashMergeAgg(perms: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(perms)(Long.MaxValue)

  override def reduce(buf: Array[Long], row: Seq[Long]): Array[Long] = {
    if (row != null && row.size >= perms) {
      var i = 0
      while (i < perms) { if (row(i) < buf(i)) buf(i) = row(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] =
    buf.toSeq // groups with no signatures keep Long.MaxValue slots

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
