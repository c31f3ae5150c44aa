package graft.dedup

import graft.{SparkEntry, SparkSpec}

/** `q_dedup_split` — the leakage-safety contract: the WHOLE point of
  * splitting by near-dup cluster instead of by document is that no
  * verified near-dup pair may straddle train/test, so assert exactly
  * that against the independent q_dedup_lsh pair gate; plus the split
  * is total, deterministic, and actually produces both sides. */
class DedupSplitSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("no verified near-dup pair straddles the split") {
    val split = SparkEntry.queries("q_dedup_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = SparkEntry.queries("q_dedup_lsh")(spark, dir)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val leaked = pairs.filter { case (a, b) => split(a) != split(b) }
    assert(leaked.isEmpty, s"near-dup pairs across the split: $leaked")
  }

  test("split is total over the corpus, both sides non-empty, and follows the canonical hash") {
    val rows = SparkEntry.queries("q_dedup_split")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.length.toLong == nDocs, "split must cover every document")
    val bySide = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySide.keySet == Set("train", "test"), s"sides: ${bySide.keySet}")
    assert(bySide("test") > 0 && bySide("train") > bySide("test"),
      s"expected a ~90/10 split, got $bySide")
    // replay the bucket rule on the canonical id
    rows.foreach { case (id, canon, side) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(canon.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want =
        if (java.lang.Long.parseLong(md5.take(8), 16) % 10 == 0) "test"
        else "train"
      assert(side == want, s"doc $id canon $canon: $side vs $want")
    }
  }
}
