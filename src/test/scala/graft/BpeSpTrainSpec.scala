package graft

import graft.queries.TextQueries

/** q_text_bpe_train_sp's production shape: the exact sequential loop
  * runs as ONE executor task over a deterministically-sampled bounded
  * vocabulary — the sentencepiece architecture — instead of K
  * pair-count shuffle jobs. Pins (1) the single-task trainer
  * rule-for-rule equal to the distributed loop on shared input, (2)
  * the sample's boundedness as a plan property (top-N, never a full
  * sort), and (3) the job-count contract that IS the point: rule
  * count no longer shows up as driver round-trips. */
class BpeSpTrainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("single-task trainer == distributed loop, rule for rule, on " +
      "the same sp vocabulary") {
    val docs = Tables.documents(spark, dir)
    // sf0.001 has fewer distinct texts than the sample bound, so the
    // sampled frame IS the full stream — the two trainers see the
    // same input and must learn the same table
    val seq = TextQueries.bpeTrainLoop(TextQueries.spSymVocab(docs), 24, 1)
      .collect().toSeq
    val loc = TextQueries.bpeTrainLocal(
      TextQueries.spSampledVocab(docs), 24).collect().toSeq
    assert(loc == seq)
  }

  test("the sample is bounded by construction: a top-N over the " +
      "content hash, never a full sort, never more than BpeSpSampleN") {
    val docs = Tables.documents(spark, dir)
    val plan = TextQueries.spSampledVocab(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains(s"TakeOrderedAndProject(limit=${TextQueries.BpeSpSampleN}"),
      s"sample is not a bounded top-N:\n$plan")
    assert(!plan.contains("Sort "),
      s"sample plan contains a full sort:\n$plan")
  }

  test("K = 256 rules cost a constant number of jobs, not K driver " +
      "round-trips") {
    val sc = spark.sparkContext
    val group = "bpe-sp-train-jobs"
    sc.setJobGroup(group, "sp trainer job-count pin")
    val out = try SparkEntry.queries("q_text_bpe_train_sp")(spark, dir)
      .collect()
    finally sc.clearJobGroup()
    assert(out.length == TextQueries.BpeSpTrainK)
    val jobs = sc.statusTracker.getJobIdsForGroup(group).length
    // stream agg + sampled top-N + the one training task (+ AQE's
    // per-shuffle materialization jobs): single digits. The
    // distributed loop's shape here would be >= K/M jobs — a red
    // test if the gate ever regresses to per-merge round-trips.
    assert(jobs > 0 && jobs <= 8, s"sp training ran $jobs jobs")
  }

  test("learned sp rules genuinely cross word boundaries (the input " +
      "that makes K = 256 reachable)") {
    val rules = SparkEntry.queries("q_text_bpe_train_sp")(spark, dir)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(rules.exists { case (a, b) =>
      (a + b).contains("▁") && (a + b).length > 1 },
      "no learned rule crosses a word boundary")
  }

  test("the local trainer's tie-break is UTF-8 byte order (ADVICE " +
      "r15): supplementary-plane chars sort AFTER U+E000, where Java " +
      "char order puts their surrogates before it") {
    val pua = new String(Character.toChars(0xE000)) // private-use BMP char
    val emoji = new String(Character.toChars(0x1F600))
    assert(graft.queries.TextQueries.utf8Less(pua, emoji))
    assert(!graft.queries.TextQueries.utf8Less(emoji, pua))
    assert(pua.compareTo(emoji) > 0,
      "teeth check: Java char order no longer disagrees here")
    // prefix law matches byte comparison
    assert(graft.queries.TextQueries.utf8Less("a", "ab"))
    assert(!graft.queries.TextQueries.utf8Less("ab", "a"))
    assert(!graft.queries.TextQueries.utf8Less("a", "a"))
  }
}
