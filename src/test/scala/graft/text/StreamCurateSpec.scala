package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** `q_stream_curate` — ingest-time curation against standing
  * artifacts. Each verdict column is pinned to the independent gate
  * that owns its rule, so the composition cannot silently drift from
  * any of its parts; the conjunction law and per-doc emission close
  * the frame. */
class StreamCurateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val newSrc = graft.queries.DedupQueries.IncNewSource

  private lazy val decisions =
    SparkEntry.queries("q_stream_curate")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5)))
      .toMap

  test("one decision per new-dump document, no more, no less") {
    val newDocs = Tables.documents(spark, dir)
      .filter(col("source") === newSrc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(decisions.keySet == newDocs)
  }

  test("dup == membership in q_stream_inc_dedup's cross-pair set " +
      "(the same store, the same sketch, the same tau)") {
    val paired = SparkEntry.queries("q_stream_inc_dedup")(spark, dir)
      .select(explode(array(col("a"), col("b"))).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val newIds = decisions.keySet
    decisions.foreach { case (id, (dup, _, _, _, _)) =>
      assert(dup == (paired contains id),
        s"doc $id: dup=$dup but cross-pair membership=${paired contains id}")
    }
    // non-vacuous both ways
    assert(decisions.values.exists(_._1) && decisions.values.exists(!_._1))
    assert((paired -- newIds).nonEmpty,
      "fixture note: every cross pair should have a standing side")
  }

  test("contaminated == q_stream_decontaminate's flagged set " +
      "restricted to the new dump") {
    val flagged = SparkEntry.queries("q_stream_decontaminate")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    decisions.foreach { case (id, (_, _, contam, _, _)) =>
      assert(contam == (flagged contains id),
        s"doc $id: contaminated=$contam vs decontaminate gate " +
          s"${flagged contains id}")
    }
  }

  test("gopher_keep == q_text_gopher's conjunction on the new dump") {
    val gopher = SparkEntry.queries("q_text_gopher")(spark, dir)
      .select(col("doc_id"), col("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    decisions.foreach { case (id, (_, _, _, gk, _)) =>
      assert(gk == gopher(id),
        s"doc $id: gopher_keep=$gk vs q_text_gopher ${gopher(id)}")
    }
    assert(decisions.values.exists(_._4) && decisions.values.exists(!_._4))
  }

  test("quality_keep == q_text_curate_incremental's quality verdict " +
      "(same standing cut, same floor-grid score)") {
    val inc = SparkEntry.queries("q_text_curate_incremental")(spark, dir)
      .select(col("doc_id"), col("quality_keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    decisions.foreach { case (id, (_, qk, _, _, _)) =>
      assert(qk == inc(id),
        s"doc $id: quality_keep=$qk vs incremental ${inc(id)}")
    }
    assert(decisions.values.exists(_._2) && decisions.values.exists(!_._2))
  }

  test("selected is exactly the conjunction of its four verdicts") {
    decisions.foreach { case (id, (dup, qk, contam, gk, sel)) =>
      assert(sel == (!dup && qk && !contam && gk), s"doc $id")
    }
    assert(decisions.values.exists(_._5) && decisions.values.exists(!_._5))
  }
}
