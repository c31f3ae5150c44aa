package graft.dedup

import graft.{SparkEntry, SparkSpec, Tables}

/** `q_dedup_containment` against an independent driver-side replay of
  * the same program (shingle → rare-shingle blocking → exact
  * containment), plus the properties that justify the gate: containment
  * dominates Jaccard on every found pair (the asymmetric measure), and
  * the blocking is exactly the stated rule — a pair is found iff it
  * shares a rare (2 ≤ df ≤ 5) shingle and passes the cut. */
class ContainmentSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val MaxDf = 5
  private val Tau = 0.8

  // the word-3-gram shingle-hash replay (the ShingleHashesSpec-proven
  // form): md5 of the shingle string, first 15 hex chars, as long
  private def shingleSet(text: String): Set[Long] = {
    val t = text.split("\\s+", -1)
    if (t.length < 3) Set.empty
    else (0 to t.length - 3).map { i =>
      val s = s"${t(i)} ${t(i + 1)} ${t(i + 2)}"
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(15), 16)
    }.toSet
  }

  test("pairs, containments and blocking match the brute-force replay") {
    val got = SparkEntry.queries("q_dedup_containment")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), shingleSet(r.getString(1))))
      .filter(_._2.nonEmpty)
    val df = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val rare = df.filter { case (_, c) => c >= 2 && c <= MaxDf }
      .keySet.toSet
    val expected = (for {
      (a, ha) <- docs; (b, hb) <- docs if a < b
      shared = ha.intersect(hb)
      if shared.exists(rare)
      c = shared.size.toDouble / math.min(ha.size, hb.size).toDouble
      if c >= Tau
    } yield ((a, b), c)).toMap

    assert(expected.nonEmpty)
    assert(got.keySet == expected.keySet,
      s"extra=${got.keySet -- expected.keySet} " +
        s"missing=${expected.keySet -- got.keySet}")
    got.foreach { case (k, c) => assert(c == expected(k), s"pair $k") }
  }

  test("containment dominates Jaccard on every found pair") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), shingleSet(r.getString(1)))).toMap
    SparkEntry.queries("q_dedup_containment")(spark, dir)
      .collect().foreach { r =>
        val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        val (ha, hb) = (docs(a), docs(b))
        val inter = ha.intersect(hb).size.toDouble
        val j = inter / (ha.size + hb.size - inter)
        assert(c >= j - 1e-12, s"pair ($a,$b): containment $c < jaccard $j")
      }
  }
}
