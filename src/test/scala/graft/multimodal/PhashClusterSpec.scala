package graft.multimodal

import graft.{SparkEntry, SparkSpec}

/** `q_mm_phash_cluster` against the pair gate it canonicalizes: every
  * verified pHash pair must share a canonical id, the assignment must
  * cover exactly the hashed-asset universe, and canonical_id must be
  * the component minimum. */
class PhashClusterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("cluster assignment canonicalizes the verified pHash pairs") {
    val assign = SparkEntry.queries("q_mm_phash_cluster")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val canon = assign.map(a => a._1 -> a._2).toMap
    val pairs = SparkEntry.queries("q_mm_phash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(canon(a) == canon(b), s"pair ($a,$b) split across clusters")
    }
    // universe = assets long enough to hash (matches the oracle's cut)
    val universe = graft.multimodal.Multimodal.assets(spark, dir)
      .filter(org.apache.spark.sql.functions
        .octet_length(org.apache.spark.sql.functions.col("payload")) >= 256)
      .count()
    assert(assign.length.toLong == universe, "assignment must be total")
    // canonical = min member; sizes consistent; some real cluster exists
    val byCanon = assign.groupBy(_._2)
    byCanon.foreach { case (c, ms) =>
      assert(ms.map(_._1).min == c, s"canonical $c is not the min member")
      assert(ms.forall(_._3 == ms.length), s"cluster_n wrong for $c")
    }
    assert(byCanon.exists(_._2.length > 1), "no non-singleton cluster")
  }
}
