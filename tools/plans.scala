import java.nio.file.{Files, Paths}
val s2 = org.apache.spark.sql.SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
s2.sparkContext.setLogLevel("ERROR")
val d = "/root/testdata/sf0.01"
val sb = new StringBuilder
sb.append("# PLANS - formatted physical plans of flagship queries (sf0.01, generated)\n\n")
sb.append("Regenerate: `/opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes -I tools/plans.scala`.\n")
sb.append("What to look for: `PushedFilters`/`ReadSchema` on every scan (pushdown + pruning),\n`BroadcastHashJoin` on dim sides, partial+final aggregates, and codegen ids `(n)` spanning operators.\n")
for (q <- Seq("q_agg_lineitem","q_semijoin","q_wiki_links","q_dedup_lsh","q_ann_lsh","q_ann_ivf","q_mm_features","q_events_asof","q_graph_components","q_components_converged","q_pagerank_iter1","q_pivot","q_distinct_kmv","q_text_bm25","q_text_heavyhitters","q_events_window_range","q_dedup_ngram_capped","q_dedup_editdist_capped","q_pagerank_cold","q_mm_decode","q_dedup_substring","q_graph_hits","q_ann_pq","q_join_salted","q_percentiles_sketch","q_text_pii","q_text_sample_stratified","q_text_tokens_bpe","q_ann_ivfpq","q_text_mixture","q_text_logprob","q_events_anomaly","q_embed_kmeans","q_graph_clustering","q_text_dsir","q_embed_knn","q_embed_kcenter","q_embed_label_clean","q_text_boilerplate","q_text_ppl_bucket","q_embed_quantize","q_text_dsir_sample","q_graph_walks","q_text_quality_cut","q_text_mixture_epochs","q_text_allpairs","q_text_bpe_train","q_embed_pca","q_embed_jl","q_embed_hardneg","q_dedup_split","q_dedup_containment","q_events_asof_nearest","q_text_curate","q_text_langid_ngram","q_mm_phash_cluster","q_text_classifier","q_text_chunk","q_text_plagiarism","q_embed_pca2","q_dedup_incremental","q_text_fingerprint","q_ann_hybrid","q_embed_bitext","q_text_bigram_lm","q_embed_domain","q_text_fertility","q_text_quality_z","q_embed_drift","q_text_pmi","q_text_curate_incremental","q_dedup_substring_removed","q_ann_maintain","q_text_bpe_train_sp","q_ann_delete","q_ann_compact","q_text_curate_cleaned","q_dedup_store_append","q_text_curate_clf","q_ann_hybrid_stored","q_text_tokens_trained","q_ann_filtered","q_ann_recall","q_text_pack_curated","q_pagerank_incremental","q_mm_phash_inc","q_text_pack_epochs","q_agg_incremental","q_events_scd","q_pagerank_maintain","q_events_pit","q_dedup_delete","q_dedup_compact","q_agg_retract","q_text_clf_stored","q_events_scd_inc","q_agg_inc2","q_agg_inc_late","q_events_scd_inc2","q_dedup_append2","q_mm_phash_inc2","q_pagerank_inc2","q_graph_delete","q_events_scd_late","q_pipeline_manifest","q_pipeline_dump2","q_ann_append2","q_events_scd_delete","q_pipeline_manifest2","q_pipeline_mixed","q_stream_commit")) {
  // q_dedup_substring materializes internally (cache + localCheckpoint), which would hide the interior plan behind an ExistingRDD — print the lazy form instead
  val df = if (q == "q_dedup_substring") graft.queries.DedupQueries.substringDupStats(graft.Tables.documents(s2, d), 8, materialize = false).orderBy("doc_id")
    else if (q == "q_dedup_substring_removed") graft.queries.DedupQueries.substringRemoval(graft.Tables.documents(s2, d), 8, materialize = false).orderBy("doc_id")
    else graft.SparkEntry.queries(q)(s2, d)
  df.collect()
  val formatted = df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  sb.append(s"\n## $q\n\n```\n").append(formatted.take(6000)).append("\n```\n")
}
Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE=" + sb.length)
sys.exit(0)
