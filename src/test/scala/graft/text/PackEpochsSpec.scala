package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** `q_text_pack_epochs` — the Muennighoff'23 allocation plan EXECUTED:
  * full passes + the md5-order remainder prefix, packed per
  * (source, rep, shard).
  *
  * Laws:
  *  1. SCHEDULE ACCOUNTING — per source, the scheduled token total
  *     never exceeds the plan's alloc, and is MAXIMAL: the next
  *     unscheduled doc in md5 order would overshoot (an eager-but-
  *     bounded remainder prefix; a zero remainder schedules exactly
  *     the full passes).
  *  2. REPETITION — every doc of a source appears exactly
  *     ⌊alloc div tot⌋ or ⌊alloc div tot⌋+1 times, and some source
  *     genuinely repeats (full_e ≥ 1 somewhere — the gate is not a
  *     relabeled q_text_pack).
  *  3. PASS PURITY + BUDGET — sequences never mix passes (the chain
  *     key carries rep) and every chain obeys the fit-or-reset 512
  *     law with dense seq ids.
  */
class PackEpochsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val Limit = 512L

  private def plan: Map[String, (Long, Long)] =
    SparkEntry.queries("q_text_mixture_epochs")(spark, dir)
      .select("source", "tot", "alloc").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def nTok: Map[Long, (String, Long, String)] =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n"),
        md5(col("doc_id").cast("string")).as("h"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getString(3))).toMap

  test("schedule accounting: per-source tokens ≤ alloc and maximal") {
    val p = plan
    val docs = nTok
    val sched = SparkEntry.queries("q_text_pack_epochs")(spark, dir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tokBySrc = sched.groupBy(_._2)
      .map { case (s, rows) => s -> rows.map(r => docs(r._1)._2).sum }
    p.foreach { case (src, (tot, alloc)) =>
      val got = tokBySrc.getOrElse(src, 0L)
      assert(got <= alloc, s"$src: scheduled $got > alloc $alloc")
      // maximality: the earliest unscheduled-in-remainder doc would
      // overshoot — equivalently alloc - got < the md5-successor's n
      val fullE = alloc / tot
      val remBudget = alloc - fullE * tot
      val inOrder = docs.toSeq.filter(_._2._1 == src)
        .sortBy { case (id, (_, _, h)) => (h, id) }
      var cum = 0L
      var taken = 0L
      inOrder.foreach { case (_, (_, n, _)) =>
        cum += n
        if (cum <= remBudget) taken += n
      }
      assert(got == fullE * tot + taken,
        s"$src: scheduled $got != ${fullE * tot} + remainder $taken")
    }
  }

  test("repetition: per-doc counts are full_e or full_e + 1; some " +
      "source genuinely repeats") {
    val p = plan
    val counts = SparkEntry.queries("q_text_pack_epochs")(spark, dir)
      .groupBy("doc_id", "source").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(counts.nonEmpty)
    counts.foreach { case (id, src, c) =>
      val (tot, alloc) = p(src)
      val fullE = alloc / tot
      assert(c == fullE || c == fullE + 1,
        s"doc $id ($src): scheduled $c times, plan says $fullE(+1)")
    }
    assert(p.exists { case (_, (tot, alloc)) => alloc / tot >= 1 },
      "no source reaches a full epoch — repetition unexercised")
  }

  test("pass purity and the fit-or-reset budget law per chain") {
    val rows = SparkEntry.queries("q_text_pack_epochs")(spark, dir)
      .select("source", "rep", "shard", "seq_id", "cum_tokens", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._2).distinct.length > 1,
      "single pass only — the rep key is unobservable")
    rows.groupBy(t => (t._1, t._2, t._3)).foreach { case (key, chain) =>
      val inOrder = chain.sortBy(_._6)
      var prevSeq = 0L
      var prevCum = 0L
      inOrder.zipWithIndex.foreach { case ((_, _, _, seq, cum, id), i) =>
        val n = if (seq == prevSeq && i > 0) cum - prevCum else cum
        assert(n > 0, s"$key doc $id: nonpositive token count")
        if (i == 0) assert(seq == 0L, s"$key: first seq_id $seq != 0")
        else if (seq == prevSeq)
          assert(cum <= Limit, s"$key doc $id: cum $cum over budget")
        else {
          assert(seq == prevSeq + 1, s"$key: seq jumped")
          assert(prevCum + n > Limit, s"$key doc $id: early reset")
        }
        prevSeq = seq; prevCum = cum
      }
    }
  }
}
