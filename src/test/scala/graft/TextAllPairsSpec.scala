package graft

/** `q_text_allpairs` against an independent driver-side replay: plain
  * Scala tokenize → 3-shingle → df cut → idf weights → cosine over
  * every doc pair (the O(n²) loop the distributed plan exists to
  * avoid — fine at 500 test docs), plus the recall property against
  * the LSH dedup family: the exact join must find every
  * LSH-verified near-dup pair. */
class TextAllPairsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val MaxDf = 5
  private val Tau = 0.5

  private def shingles(text: String): Seq[String] = {
    // limit -1 keeps trailing empty tokens, matching Spark's split
    // (limit -1) and DuckDB's string_split on trailing whitespace
    val t = text.split("\\s+", -1)
    if (t.length < 3) Seq.empty
    else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
  }

  test("pairs and cosines match the brute-force replay") {
    val got = SparkEntry.queries("q_text_allpairs")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val n = docs.size
    val tf = docs.map { case (id, text) =>
      id -> shingles(text).groupBy(identity).map { case (s, o) =>
        (s, o.size.toLong)
      }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (s, o) => (s, o.size) }
    val feat = tf.map { case (id, m) =>
      id -> m.collect { case (s, c) if df(s) <= MaxDf =>
        (s, c.toDouble * (math.log((n.toDouble + 1) / (df(s) + 1)) + 1))
      }
    }
    val nrm = feat.map { case (id, m) =>
      id -> math.sqrt(m.values.map(w => w * w).sum)
    }
    val expected = (for {
      (a, fa) <- feat; (b, fb) <- feat if a < b
      shared = fa.keySet.intersect(fb.keySet) if shared.nonEmpty
    } yield {
      val dot = shared.toSeq.map(s => fa(s) * fb(s)).sum
      ((a, b), dot / (nrm(a) * nrm(b)))
      // 5e-7 guard = half the engine's 1e-6 presentation grid: a raw
      // cosine in [Tau - 5e-7, Tau) rounds UP to Tau in the engine and
      // is kept, so the replay must keep it too
    }).filter(_._2 >= Tau - 5e-7).toMap

    assert(got.keySet == expected.keySet,
      s"pair sets differ: extra=${got.keySet -- expected.keySet} " +
        s"missing=${expected.keySet -- got.keySet}")
    got.foreach { case (k, c) =>
      // engine presents on the 1e-6 floor grid; replay sums in an
      // arbitrary order so allow an interpolation-scale tolerance
      assert(math.abs(c - expected(k)) < 1e-6, s"pair $k: $c vs ${expected(k)}")
    }
  }

  test("exact join finds every LSH-verified near-dup pair") {
    val exact = SparkEntry.queries("q_text_allpairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q_dedup_lsh")(spark, dir)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(exact),
      s"LSH pairs the exact join missed: ${lsh -- exact}")
  }
}
