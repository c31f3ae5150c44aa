package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** `q_embed_drift` against an exact driver-side replay on the real
  * sf0.001 embeddings — long arithmetic end to end, so equality, not
  * tolerance — plus slice-accounting laws. */
class DriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Q = 1048576.0

  test("per-label centroid shift matches an exact driver-side replay") {
    val got = SparkEntry.queries("q_embed_drift")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val rows = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray.map(v => math.floor(v.toDouble * Q).toLong)))
    val hi = rows.map(_._1).max
    val thr = hi - hi / 10
    def centroid(g: Array[(Long, Int, Array[Long])]): Array[Long] =
      Array.tabulate(64)(i =>
        math.floor(g.map(_._3(i)).sum.toDouble / g.length).toLong)
    val ref = rows.groupBy(_._2).toSeq.flatMap { case (l, g) =>
      val st = g.filter(_._1 < thr)
      val nw = g.filter(_._1 >= thr)
      if (st.isEmpty || nw.isEmpty) None
      else {
        val (cs, cn) = (centroid(st.toArray), centroid(nw.toArray))
        var d = 0L; var i = 0
        while (i < 64) { val df = cs(i) - cn(i); d += df * df; i += 1 }
        Some((l, st.length.toLong, nw.length.toLong, d))
      }
    }.sortBy(_._1)

    assert(got.toSeq == ref && got.nonEmpty)
  }

  test("slice accounting: standing + new = the label's corpus count") {
    val got = SparkEntry.queries("q_embed_drift")(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1) + r.getLong(2))).toMap
    val totals = Tables.embeddings(spark, dir)
      .groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // every reported label's two slices partition its vectors
    got.foreach { case (l, n) => assert(n == totals(l), s"label $l") }
  }
}
