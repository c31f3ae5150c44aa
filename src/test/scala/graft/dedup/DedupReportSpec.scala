package graft.dedup

import graft.{SparkEntry, SparkSpec}

/** `q_dedup_report` accounting laws against the cluster assignment it
  * aggregates (sf0.001). */
class DedupReportSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("per-source totals reconcile with the cluster assignment") {
    val rep = SparkEntry.queries("q_dedup_report")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val cl = SparkEntry.queries("q_dedup_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val src = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    assert(rep.values.map(_._1).sum == cl.length)
    assert(rep.values.map(_._2).sum == cl.count { case (d, c) => d == c })
    cl.groupBy { case (d, _) => src(d) }.foreach { case (s, g) =>
      val (n, kept, rate) = rep(s)
      assert(n == g.length && kept == g.count { case (d, c) => d == c },
        s"source $s totals")
      val ref = math.floor((1.0 - kept.toDouble / n) * 1.0e6 + 0.5) / 1.0e6
      assert(rate == ref, s"source $s rate $rate vs $ref")
    }
    // non-vacuity: the corpus has near-dup clusters, so some source
    // must report a positive dup rate
    assert(rep.values.exists(_._3 > 0.0), "every source reports 0 dups")
  }
}
