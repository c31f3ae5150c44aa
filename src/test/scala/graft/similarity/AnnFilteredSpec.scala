package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** `q_ann_filtered` — per-query attribute-constrained search over the
  * attribute-carrying stored index (the filtered-vector-search shape:
  * in-tenant / in-language kNN).
  *
  * Laws:
  *  1. CONSTRAINT — every returned neighbor carries the query's own
  *     label (checked against the source table, not the index, so an
  *     index-build bug that scrambled the inline attribute fails here).
  *  2. TEETH — the constraint genuinely changes answers vs the
  *     unconstrained stored search (a vacuous filter would pass law 1
  *     trivially).
  *  3. QUALITY — recall@K against the EXACT same-label top-K (the
  *     constrained ground truth, computed independently here) clears a
  *     floor. This is the law the widened probe set exists for:
  *     at the generic nprobe=3 this corpus measures 0.64 (the
  *     filtered-ANN failure mode — the constrained top-K spreads over
  *     more lists), at FilteredNprobe it measures 1.0 here (5 of 5
  *     cells at this SF; at sf0.1's 16 cells the widened probe still
  *     prunes 11 lists).
  *  4. SHAPE — the extra equi-key rides the existing broadcast probe
  *     join: the store scan still bucket-prunes and nothing
  *     degenerates to a cartesian product.
  */
class AnnFilteredSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val K = 5

  private def emb = graft.Tables.embeddings(spark, dir)

  test("every neighbor has the query's label, and every query answers") {
    val res = SparkEntry.queries("q_ann_filtered")(spark, dir)
    val labels = emb.select(col("vec_id"), col("label"))
    val joined = res
      .join(labels.withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("label", "qlabel"), "qid")
      .join(labels, "vec_id")
    assert(joined.filter(col("label") =!= col("qlabel")).count() == 0,
      "a neighbor escaped the label constraint")
    val nQueries = emb.filter(col("vec_id") % 100 === 0).count()
    assert(res.select("qid").distinct().count() == nQueries,
      "a query dropped out of the filtered result")
  }

  test("the constraint has teeth: answers differ from the " +
      "unconstrained stored search") {
    val filtered = SparkEntry.queries("q_ann_filtered")(spark, dir)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = SparkEntry.queries("q_ann_ivfpq_stored")(spark, dir)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((plain -- filtered).nonEmpty,
      "the unconstrained search returned only same-label neighbors — " +
        "the constraint is vacuous on this corpus")
    assert((filtered -- plain).nonEmpty,
      "filtering never surfaced a neighbor the generic top-K missed — " +
        "post-filtering would have sufficed, the gate proves nothing")
  }

  test("recall@5 vs the exact same-label top-K clears the floor") {
    import org.apache.spark.sql.expressions.Window
    val e = emb
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    graft.GraftFunctions.register(spark)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    // exact constrained ground truth: same-label corpus scan
    val truth = e.join(broadcast(q),
        col("vec_id") =!= col("qid") && col("label") === col("qlabel"))
      .select(col("qid"), col("vec_id"),
        call_function("cosine_sim", col("qv"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val got = SparkEntry.queries("q_ann_filtered")(spark, dir)
      .select("qid", "vec_id")
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val recalls = truth.map { case (qid, t) =>
      got.getOrElse(qid, Set.empty).intersect(t).size.toDouble / K
    }
    val mean = recalls.sum / recalls.size
    info(f"filtered recall@5 = $mean%.3f")
    assert(mean >= 0.7,
      f"constrained recall collapsed to $mean%.3f — the pre-filter no " +
        "longer finds true same-label neighbors")
  }

  test("plan: the constraint rides the pruned scan — buckets still " +
      "prune, no cartesian product") {
    val df = SparkEntry.queries("q_ann_filtered")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"filtered search degenerated to a cartesian product:\n${plan.take(2000)}")
    assert(plan.contains("SelectedBucketsCount"),
      s"the label constraint broke bucket pruning:\n${plan.take(2000)}")
  }
}
