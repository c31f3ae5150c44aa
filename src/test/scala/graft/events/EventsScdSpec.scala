package graft.events

import graft.{SparkEntry, SparkSpec, Tables}

/** `q_events_scd` — the Kimball type-2 dimension build: a per-user
  * change log collapsed to versioned validity intervals.
  *
  * Laws:
  *  1. CHAIN — per user: versions dense from 1; each interval closes
  *     exactly at the next interval's start; precisely the last
  *     version is open (valid_to NULL ∧ is_current).
  *  2. COLLAPSE — consecutive versions carry DIFFERENT attribute
  *     values (type-2 versions changes, not arrivals), and collapsing
  *     genuinely fires on this corpus (some user has fewer versions
  *     than events).
  *  3. RECONSTRUCTION — replaying the raw event log per user yields
  *     exactly the gate's (version, event_type) chain.
  */
class EventsScdSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def scd = SparkEntry.queries("q_events_scd")(spark, dir)
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2),
      Option(r.getString(3)), r.getBoolean(4), r.getLong(5)))

  test("interval chain: dense versions, closed at successor, one open") {
    val rows = scd
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, chain) =>
      val inOrder = chain.sortBy(_._6)
      inOrder.zipWithIndex.foreach { case ((_, _, vf, vt, cur, ver), i) =>
        assert(ver == i + 1, s"user $user: version gap at $ver")
        if (i < inOrder.length - 1) {
          assert(vt.contains(inOrder(i + 1)._3),
            s"user $user v$ver: valid_to ${vt} != next valid_from " +
              s"${inOrder(i + 1)._3}")
          assert(!cur, s"user $user v$ver: non-last row marked current")
        } else {
          assert(vt.isEmpty && cur,
            s"user $user v$ver: last version not open/current")
        }
      }
    }
  }

  test("collapse: consecutive versions differ; collapsing fires") {
    val rows = scd
    rows.groupBy(_._1).foreach { case (user, chain) =>
      chain.sortBy(_._6).toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val (a, b) = (pair(0), pair(1))
          assert(a._2 != b._2,
            s"user $user: versions ${a._6}/${b._6} share value ${a._2} — " +
              "a no-change update was versioned")
        }
      }
    }
    val nEvents = Tables.events(spark, dir).count()
    assert(rows.length < nEvents,
      "every event became a version — the collapse never fired")
  }

  test("reconstruction: the chain equals a replay of the raw log") {
    import org.apache.spark.sql.functions._
    val log = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        (r.getTimestamp(1).getNanos / 1000) % 1000,
        r.getLong(2), r.getString(3)))
    val want = log.groupBy(_._1).map { case (user, evs) =>
      val vals = evs.sortBy(e => (e._2, e._3)).map(_._4)
      user -> vals.foldLeft(List.empty[String]) {
        case (acc, v) if acc.headOption.contains(v) => acc
        case (acc, v) => v :: acc
      }.reverse
    }
    val got = scd.groupBy(_._1).map { case (user, chain) =>
      user -> chain.sortBy(_._6).map(_._2).toList
    }
    assert(got == want, "the version chain diverged from the log replay")
  }
}
