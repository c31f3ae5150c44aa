package graft

/** `q_text_gopher` rule-consistency and `q_events_asof_fwd` driver-side
  * replay — the invariants their oracles alone don't state. */
class TextGopherSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("gopher: keep is exactly the conjunction of the rule columns, " +
      "and the filter is non-vacuous in both directions") {
    val rows = SparkEntry.queries("q_text_gopher")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (1 to 6).map(r.getBoolean), r.getBoolean(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, rules, keep) =>
      assert(keep == rules.forall(identity), s"doc $id")
    }
    assert(rows.exists(_._3) && rows.exists(!_._3))
    // at least two DIFFERENT rules must actually cut somewhere, or the
    // rule set has collapsed to a single predicate on this corpus
    val cutting = (0 until 6).filter(i => rows.exists(!_._2(i)))
    assert(cutting.size >= 2, s"only rules $cutting cut")
  }

  test("forward as-of equals the driver-side next-signup scan") {
    val ev = Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("error", "signup"))
      .select("user_id", "event_id", "ts", "event_type")
      .collect()
      .map { r =>
        val i = r.getTimestamp(2).toInstant
        (r.getLong(0), r.getLong(1),
          i.getEpochSecond * 1000000L + i.getNano / 1000L, r.getString(3))
      }
    val byUser = ev.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._3, e._2))).toMap
    val expect = ev.filter(_._4 == "error").sortBy(_._2).map {
      case (u, eid, ets, _) =>
        val next = byUser(u)
          .filter(e => e._4 == "signup" &&
            (e._3 > ets || (e._3 == ets && e._2 > eid)))
          .headOption
        (u, eid, next.map(_._2), next.map(n => (n._3 - ets) / 1000000L))
    }.toSeq
    val got = SparkEntry.queries("q_events_asof_fwd")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got.nonEmpty)
    assert(got == expect)
    // the open side must be real: some error has no later signup
    assert(got.exists(_._3.isEmpty) && got.exists(_._3.nonEmpty))
  }
}
