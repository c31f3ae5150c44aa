package graft

/** `q_text_bpe_train` against an independent driver-side replay of the
  * greedy BPE loop (Sennrich'16): plain Scala strings and hash maps,
  * no Spark expressions — same (count DESC, a, b) argmax, same
  * left-to-right non-overlapping merge semantics (String.replace).
  * Also pins the property that makes training training: each learned
  * rule strictly shrinks the corpus symbol count, and later rules may
  * consume earlier merged symbols. */
class TextBpeTrainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val Sep = graft.functions.BpeSymbolsUtil.Sep.toString

  test("learned merge table matches the replayed greedy loop") {
    val got = SparkEntry.queries("q_text_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

    // replay: word frequencies from the raw table
    val words = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, dir).select("text").collect().foreach { r =>
      r.getString(0).split("\\s+").filter(_.nonEmpty)
        .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L)
    }
    var vocab: Map[String, Long] =
      words.toMap.map { case (w, c) => (w.flatMap(ch => ch + Sep), c) }
    val expected = (1 to got.size).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (sym, c) =>
        val ss = sym.split(Sep, -1)
        // trailing "" from the terminator: adjacent pairs exclude it
        (0 until ss.length - 2).foreach { i =>
          val k = (ss(i), ss(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
        }
      }
      val ((a, b), cnt) = counts.toSeq.minBy { case ((a, b), c) =>
        (-c, a, b)
      }
      vocab = vocab.map { case (sym, c) =>
        (sym.replace(a + Sep + b + Sep, a + b + Sep), c)
      }
      (r, a, b, cnt)
    }
    assert(got == expected)
  }

  test("rules compose: merges shrink symbols and later rules may use " +
      "earlier products") {
    val got = SparkEntry.queries("q_text_bpe_train")(spark, dir)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // every learned a/b is a single char OR a product of earlier rules
    val products = scala.collection.mutable.Set.empty[String]
    got.foreach { case (a, b) =>
      assert(a.length == 1 || products.contains(a), s"unseen symbol $a")
      assert(b.length == 1 || products.contains(b), s"unseen symbol $b")
      products += (a + b)
    }
    // the gate corpus is big enough that some rule builds on another
    assert(got.exists { case (a, b) => a.length > 1 || b.length > 1 },
      "no rule consumed an earlier merge — K too small to pin composition")
  }

  test("per-merge cost is flat: the replace chain resets on the " +
      "checkpoint cadence — iteration r replays at most (r mod 32) " +
      "replaces, never r") {
    val depths = scala.collection.mutable.Map.empty[Int, Int]
    graft.queries.TextQueries.bpeTrain(Tables.documents(spark, dir), 40,
      onSyms = (r, syms) => {
        val plan = syms.queryExecution.analyzed.toString
        depths(r) = "(?i)replace\\(".r.findAllIn(plan).length
      })
    // pre-cadence the chain grows one replace per merge…
    assert(depths(31) == 31, s"expected depth 31 at merge 31, got ${depths(31)}")
    // …then the 32-merge checkpoint truncates it (an RDD-scan leaf)…
    assert(depths(32) == 0, s"chain not reset at the cadence: ${depths(32)}")
    // …and growth restarts from the new leaf — the O(K²) replay of the
    // unreset loop is structurally impossible
    assert(depths(33) == 1 && depths(40) == 8,
      s"post-cadence depths drifted: ${depths(33)}, ${depths(40)}")
  }

  test("the learned table loads through the alternate-table seam and " +
      "tokenizes the corpus it was trained on") {
    val learned = SparkEntry.queries("q_text_bpe_train")(spark, dir)
      .collect().map(r => (r.getString(1), r.getString(2))).toIndexedSeq
    assert(learned.size == 64)
    val texts = Tables.documents(spark, dir).select("text")
      .limit(50).collect().map(_.getString(0))
    val sep = graft.functions.BpeSymbolsUtil.Sep
    texts.foreach { t =>
      val syms = graft.functions.BpeSymbolsUtil.applyMerges(t, learned)
      val n = syms.count(_ == sep)
      val chars = t.count(_ != '\n')
      // a 64-rule table trained ON this corpus must genuinely compress:
      // strictly fewer symbols than characters on any multi-word doc
      assert(n > 0 && n < chars,
        s"learned table failed to compress: $n symbols / $chars chars")
      // round-trip safety: stripping separators recovers the text
      // modulo the regex-skipped newlines (the BpeSpec contract)
      assert(syms.filter(_ != sep) == t.filter(_ != '\n'))
    }
  }
  test("the roundtrip gate's column chain == BpeSymbolsUtil.applyMerges " +
      "per document (one replace law: train, apply, gate)") {
    val gate = SparkEntry.queries("q_text_tokens_trained")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3)))
      .toMap
    val learned = graft.queries.TextQueries.trainedRules(spark, dir)
    assert(learned.size == 64)
    val sep = graft.functions.BpeSymbolsUtil.Sep
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").limit(50).collect()
    assert(docs.nonEmpty)
    docs.foreach { row =>
      val (id, t) = (row.getLong(0), row.getString(1))
      val syms = graft.functions.BpeSymbolsUtil.applyMerges(t, learned)
      val (nBpe, md5Hex) = gate(id)
      assert(nBpe == syms.count(_ == sep).toLong,
        s"doc $id: symbol count diverged from applyMerges")
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(syms.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(md5Hex == want, s"doc $id: symbol string diverged")
    }
  }
}
