package graft.dedup

import graft.{SparkEntry, SparkSpec}

/** `q_dedup_substring_removed` (Lee'22 ExactSubstr removal, VERDICT r14
  * item 3): a closed-form fixture where the duplicated spans are known
  * exactly, plus consistency laws against the counting gate
  * (q_dedup_substring) on the real sf0.001 corpus. */
class SubstringRemovalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("closed form: exactly the corpus-duplicated 8-gram spans are " +
      "excised, short docs stay intact, fully-duplicated docs empty out") {
    import spark.implicits._
    val docs = Seq(
      // A and B share the 8-gram x1..x8 at different offsets: A keeps
      // its 2-token tail, B keeps its 1-token head
      (1L, "x1 x2 x3 x4 x5 x6 x7 x8 y1 y2"),
      (2L, "z1 x1 x2 x3 x4 x5 x6 x7 x8"),
      // 7 tokens — below the window width, no windows, intact
      (3L, "u1 u2 u3 u4 u5 u6 u7"),
      // D and E are identical 9-token docs: every window duplicated,
      // every token covered, nothing kept
      (4L, "v1 v2 v3 v4 v5 v6 v7 v8 v9"),
      (5L, "v1 v2 v3 v4 v5 v6 v7 v8 v9")
    ).toDF("doc_id", "text")
    val got = graft.queries.DedupQueries.substringRemoval(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got(1L) == ((10L, 8L, md5hex("y1 y2"))))
    assert(got(2L) == ((9L, 8L, md5hex("z1"))))
    assert(got(3L) == ((7L, 0L, md5hex("u1 u2 u3 u4 u5 u6 u7"))))
    assert(got(4L) == ((9L, 9L, md5hex(""))))
    assert(got(5L) == ((9L, 9L, md5hex(""))))
  }

  test("laws vs the counting gate at sf0.001: removal touches exactly " +
      "the docs with duplicated windows, and window/token counts tie out") {
    val removed = SparkEntry.queries("q_dedup_substring_removed")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3))).toMap
    val counted = SparkEntry.queries("q_dedup_substring")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(removed.keySet == counted.keySet && removed.nonEmpty)
    counted.foreach { case (id, (nWin, dupWin)) =>
      val (nTok, nRem, _) = removed(id)
      // same window definition: n_windows = n_tok - 7 when any exist
      if (nWin > 0) assert(nTok == nWin + 7, s"window count ties at $id")
      // a doc loses tokens iff it has duplicated windows, and each
      // dup window covers ≥ its own 8 tokens' worth across the doc
      assert((nRem > 0) == (dupWin > 0), s"removal iff dup windows at $id")
      if (dupWin > 0) assert(nRem >= 8 && nRem <= nTok,
        s"span coverage bounds at $id")
    }
  }

  test("untouched docs keep their exact re-joined text digest") {
    import org.apache.spark.sql.functions._
    val removed = SparkEntry.queries("q_dedup_substring_removed")(spark, dir)
      .filter(col("n_removed") === 0)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(removed.nonEmpty, "fixture vacuous: every doc was touched")
    val texts = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    removed.foreach { case (id, m) =>
      assert(m == md5hex(texts(id).split("\\s+", -1).mkString(" ")),
        s"intact digest at $id")
    }
  }
}
