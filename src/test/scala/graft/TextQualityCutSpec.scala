package graft

import org.apache.spark.sql.functions.col

/** `q_text_quality_cut` against a driver-side replay: per-source p75
  * over the 1e-6-QUANTIZED scores (the shipped semantics — the grid is
  * what makes the interpolated cut ulp-safe, see the query scaladoc),
  * strict-> keep flags, and the property that motivates per-source
  * cuts at all — every source keeps some docs and drops some. */
class TextQualityCutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def snap(x: Double): Double = math.floor(x * 1.0e6 + 0.5) / 1.0e6

  // Spark Percentile: index = p·(n−1) over the sorted values,
  // result = lower + (higher − lower) · frac
  private def p75(vs: Seq[Double]): Double = {
    val s = vs.sorted
    val pos = 0.75 * (s.length - 1)
    val lo = s(math.floor(pos).toInt)
    val hi = s(math.ceil(pos).toInt)
    lo + (hi - lo) * (pos - math.floor(pos))
  }

  test("keep flags match the replayed per-source p75 over snapped scores") {
    val got = SparkEntry.queries("q_text_quality_cut")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    // raw scores from the already-gated quality operator (bit-equal)
    val q = SparkEntry.queries("q_text_quality")(spark, dir)
      .select(col("doc_id"), col("quality"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val cuts = got.groupBy(_._2).view
      .mapValues(rows => p75(rows.map(r => snap(q(r._1))).toSeq)).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, src, quality, kept) =>
      assert(quality == q(id), s"doc $id score drifted from q_text_quality")
      // the grid contract: every snapped score is exactly ON the cut
      // (tie → dropped) or ≥ 0.25e-6 away, so replay-vs-engine
      // interpolation ulps can never flip a flag — compare exactly
      assert(kept == snap(quality) > cuts(src),
        s"doc $id: kept=$kept qq=${snap(quality)} cut=${cuts(src)}")
    }
  }

  test("every source both keeps and drops — the per-source property") {
    val got = SparkEntry.queries("q_text_quality_cut")(spark, dir)
      .collect().map(r => (r.getString(1), r.getBoolean(3)))
    val bySrc = got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(bySrc.size > 1)
    bySrc.foreach { case (src, flags) =>
      assert(flags.contains(true), s"source $src kept nothing")
      assert(flags.contains(false), s"source $src dropped nothing")
    }
  }
}
