package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.col

/** `q_text_boilerplate` against a full driver-side replay of the
  * repeated-segment strip on the real sf0.001 documents: same 3-word
  * chunking, same distinct-doc recurrence threshold (3), same ordered
  * reassembly digest. */
class TextBoilerplateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val (w, t) = (3, 3)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def replay(): Map[Long, (Long, Long, String)] = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val segs = docs.map { case (id, text) =>
      id -> text.split("\\s+", -1).grouped(w).map(_.mkString(" ")).toVector
    }
    val df = segs.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, g) => s -> g.length }
    val hot = df.collect { case (s, n) if n >= t => s }.toSet
    segs.map { case (id, ss) =>
      val kept = ss.filterNot(hot)
      id -> (ss.length.toLong, kept.length.toLong, md5hex(kept.mkString(" ")))
    }.toMap
  }

  test("n_seg, n_kept and the cleaned digest match the replay at sf0.001") {
    val got = SparkEntry.queries("q_text_boilerplate")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
    val ref = replay()
    assert(got.length == ref.size && got.nonEmpty)
    got.foreach { case (id, g) =>
      assert(g == ref(id), s"doc $id: $g vs ${ref(id)}")
    }
  }

  test("the pass is non-vacuous: some docs lose segments, none gain") {
    val got = SparkEntry.queries("q_text_boilerplate")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.forall { case (n, k) => k <= n && k >= 0 })
    assert(got.exists { case (n, k) => k < n }, "no segment was stripped")
    assert(got.exists { case (n, k) => k > 0 }, "everything was stripped")
  }
}
