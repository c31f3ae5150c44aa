package graft.text

import graft.{SparkEntry, SparkSpec}

/** `q_text_curate_incremental` composition laws on the real sf0.001
  * corpus: each verdict column is consistent with the constituent gate
  * it composes, and `selected` is exactly the conjunction. */
class CurateIncSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    SparkEntry.queries("q_text_curate_incremental")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))

  test("selected is exactly ¬dup ∧ quality_keep ∧ ¬contaminated ∧ " +
      "gopher_keep") {
    assert(rows.nonEmpty)
    rows.foreach { case (id, dup, qk, cont, gk, sel) =>
      assert(sel == (!dup && qk && !cont && gk), s"doc $id")
    }
  }

  test("dup column is consistent with the incremental pair graph") {
    val pairs = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    rows.foreach { case (id, dup, _, _, _, _) =>
      // a doc outside every pair is a singleton component — never dup;
      // a dup doc must appear in at least one verified pair's closure
      if (!paired.contains(id))
        assert(!dup, s"doc $id dup without any incremental pair")
    }
    // non-vacuity at the composition level: the slice has at least one
    // paired doc, and pairing implies dup for at least one member
    // (either the pair touches standing, or the larger new id drops)
    val pairedNew = rows.filter(r => paired.contains(r._1))
    assert(pairedNew.nonEmpty && pairedNew.exists(_._2),
      "pairs exist but nothing was marked dup")
  }

  test("contaminated and gopher_keep equal the standalone gates on the " +
      "slice") {
    val cont = SparkEntry.queries("q_text_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val gop = SparkEntry.queries("q_text_gopher")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    rows.foreach { case (id, _, _, c, g, _) =>
      assert(cont(id) == c, s"doc $id contaminated mismatch")
      assert(gop(id) == g, s"doc $id gopher mismatch")
    }
  }

  test("quality_keep applies the pooled STANDING p75 (driver replay of " +
      "Spark's percentile interpolation)") {
    val q = SparkEntry.queries("q_text_quality")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val docsSrc = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def qq(x: Double): Double = math.floor(x * 1.0e6 + 0.5) / 1.0e6
    val standing = q.filter { case (id, _) =>
      docsSrc(id) != graft.queries.DedupQueries.IncNewSource }
      .values.map(qq).toArray.sorted
    val pos = 0.75 * (standing.length - 1)
    val (lo, hi) = (standing(pos.toInt), standing(math.ceil(pos).toInt))
    val cut =
      if (lo == hi || math.ceil(pos) == math.floor(pos)) lo
      else (math.ceil(pos) - pos) * lo + (pos - math.floor(pos)) * hi
    rows.foreach { case (id, _, qk, _, _, _) =>
      assert(qk == (qq(q(id)) > cut), s"doc $id quality_keep vs cut $cut")
    }
  }
}
