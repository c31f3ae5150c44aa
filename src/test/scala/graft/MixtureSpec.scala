package graft

/** q_text_mixture: the per-source token-budget invariants that must
  * hold whatever the corpus (the hash gate pins exact values; this
  * pins the SEMANTICS so a budget/prune/order change can't silently
  * turn the mixture into something else). */
class MixtureSpec extends SparkSpec {

  private val Budget = 1000L

  test("mixture fills per-source budgets: prefix-closed, never over (except a lone oversized head)") {
    val s = spark
    import s.implicits._
    val out = queries.TextQueries.queries("q_text_mixture")(
      s, "/root/testdata/sf0.001")
      .select("source", "doc_id", "n_tok", "cum_tok")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._4)
      // cumulative sums are consistent: cum_k = cum_{k-1} + n_tok_k
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 === a._4 + b._3, src)
        case _ => ()
      }
      // budget respected, except a single oversized first doc
      sorted.zipWithIndex.foreach { case ((_, _, n, cum), i) =>
        assert(cum <= Budget || (i == 0 && cum === n), s"$src over budget")
      }
    }
  }

  test("temperature mixture: budgets are the sqrt-share split of the " +
      "global budget and each source's fill respects its own budget") {
    val s = spark
    import s.implicits._
    val TotalBudget = 8000L
    val out = queries.TextQueries.queries("q_text_mixture_temp")(
      s, "/root/testdata/sf0.001")
      .select("source", "doc_id", "n_tok", "src_budget", "cum_tok")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // one budget per source; the sqrt split can never exceed the global
    // budget in total (floors only lose tokens)
    val budgets = out.groupBy(_._1).view.mapValues(_.map(_._4).distinct).toMap
    assert(budgets.values.forall(_.size == 1))
    assert(budgets.values.map(_.head).sum <= TotalBudget)
    // upweighting property: the sqrt split gives every participating
    // source a budget, and no source hogs the proportional share it
    // would get under alpha = 1 unless it is small
    assert(budgets.values.forall(_.head > 0))
    out.groupBy(_._1).foreach { case (src, rows) =>
      val b = rows.head._4
      rows.sortBy(_._5).zipWithIndex.foreach { case ((_, _, n, _, cum), i) =>
        assert(cum <= b || (i == 0 && cum === n), s"$src over budget")
      }
    }
  }

  test("epochs mixture: replayed allocation, caps respected, clamp " +
      "non-vacuous, surplus actually redistributed") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.01"
    val got = queries.TextQueries.queries("q_text_mixture_epochs")(s, dir)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    // driver-side replay of the Muennighoff'23 rule on the raw corpus
    val tots = Tables.documents(s, dir)
      .selectExpr("source", "cast(size(split(text, '\\\\s+')) as long) n")
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val srcs = tots.keys.toSeq.sorted
    val ws = srcs.map(src => math.sqrt(tots(src).toDouble)).sum
    val b = 2L * tots.values.sum
    val raw = srcs.map { src =>
      src -> math.floor(
        b.toDouble * math.sqrt(tots(src).toDouble) / ws).toLong
    }.toMap
    val cap = srcs.map(src => src -> 2L * tots(src)).toMap
    val clamped = srcs.filter(src => raw(src) > cap(src)).toSet
    val over = clamped.toSeq.map(src => raw(src) - cap(src)).sum
    val wu = srcs.filterNot(clamped)
      .map(src => math.sqrt(tots(src).toDouble)).sum
    val ref = srcs.map { src =>
      val alloc1 = math.min(raw(src), cap(src))
      val add = if (!clamped(src) && wu > 0.0)
        math.floor(over.toDouble * math.sqrt(tots(src).toDouble) / wu).toLong
      else 0L
      src -> math.min(alloc1 + add, cap(src))
    }.toMap

    assert(got.keySet == tots.keySet)
    got.foreach { case (src, (tot, rawB, alloc, epochs)) =>
      assert(tot == tots(src) && rawB == raw(src) && alloc == ref(src),
        s"$src: got ($tot, $rawB, $alloc) want " +
          s"(${tots(src)}, ${raw(src)}, ${ref(src)})")
      assert(math.abs(epochs - alloc.toDouble / tot) < 1e-12)
      assert(alloc <= 2L * tot, s"$src beyond the repetition cap")
    }
    // the rule must actually bite both ways on this corpus
    assert(clamped.nonEmpty, "no source clamped — cap vacuous")
    assert(clamped.size < srcs.size, "every source clamped — pool empty")
    assert(srcs.exists(src => !clamped(src) && ref(src) > raw(src)),
      "surplus never reached an uncapped source")
  }
}
