package graft

/** `q_events_asof_nearest` against the two directional gates it
  * composes: for every error, the nearest pick must be one of the two
  * directional answers, must carry the smaller gap (tie → backward),
  * and must fall back to the surviving side when one is open. */
class AsofNearestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("nearest = min-gap of the backward and forward directional gates") {
    val back = SparkEntry.queries("q_events_asof")(spark, dir)
      .collect()
      .map(r => r.getLong(1) -> (Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    val fwd = SparkEntry.queries("q_events_asof_fwd")(spark, dir)
      .collect()
      .map(r => r.getLong(1) -> (Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    val near = SparkEntry.queries("q_events_asof_nearest")(spark, dir)
      .collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.getString(3)), Option(r.get(4)).map(_.asInstanceOf[Long])))

    assert(near.nonEmpty)
    assert(near.exists(_._3.contains("backward")) &&
      near.exists(_._3.contains("forward")),
      "corpus should exercise both directions")
    near.foreach { case (err, sid, dirn, gap) =>
      val (bId, bGap) = back(err)
      val (fId, fGap) = fwd(err)
      (bId, fId) match {
        case (None, None) =>
          assert(sid.isEmpty && dirn.isEmpty && gap.isEmpty, s"err $err")
        case (Some(_), None) =>
          assert(sid == bId && dirn.contains("backward") && gap == bGap,
            s"err $err: open forward side must fall back to backward")
        case (None, Some(_)) =>
          assert(sid == fId && dirn.contains("forward") && gap == fGap,
            s"err $err: open backward side must fall back to forward")
        case (Some(_), Some(_)) =>
          // directional gates floor to seconds; the engine compares µs,
          // so an equal-second "tie" here legally goes either way
          if (bGap.get < fGap.get)
            assert(sid == bId && dirn.contains("backward") && gap == bGap,
              s"err $err: backward wins smaller gaps")
          else if (fGap.get < bGap.get)
            assert(sid == fId && dirn.contains("forward") && gap == fGap,
              s"err $err: forward wins strictly smaller gaps")
          else
            assert((sid == bId && dirn.contains("backward") && gap == bGap)
              || (sid == fId && dirn.contains("forward") && gap == fGap),
              s"err $err: equal-second pick must still be a directional answer")
      }
    }
  }
}
