package graft

import org.apache.spark.sql.SparkSession

/** Dumps physical plans of representative queries for plan review. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q_hist_build", "q_emd1d_pairs", "q_cosine_topk",
        "q_jaccard_pairs", "q_treeemd3d_pairs", "q_tfidf_pairs",
        "q_contamination", "q_stratified_sample", "q_token_budget",
        "q_asof_join", "q_range_join", "q_chunking", "q_repetition",
        "q_kmeans", "q_ann_batch", "q_span_dedup", "q_oov_rate",
        "q_span_rewrite", "q_lm_surprisal", "q_contamination_capped",
        "q_resize_hist", "q_winnow", "q_winnow_pairs", "q_audio_rms",
        "q_span_rewrite_capped", "q_keep_best", "q_sessionize",
        "q_winnow_spans", "q_jpeg_hist", "q_png_hist",
        "q_pq_topk", "q_pq_rerank",
        "q_heavy_hitters", "q_approx_distinct", "q_zorder_key",
        "q_funnel", "q_bigram_surprisal", "q_image_phash",
        "q_ivfpq_topk", "q_cdc_chunks",
        "q_pipeline", "q_bloom_join", "q_cms_audit", "q_data_split",
        "q_cooccur", "q_bm25_topk",
        "q_edit_pairs", "q_dsir_select", "q_semdedup", "q_domain_mix",
        "q_event_dedup", "q_emb_outliers",
        "q_html_extract", "q_exact_substr", "q_json_ingest",
        "q_url_normalize", "q_pii_luhn", "q_ingest_pipeline",
        "q_phrase_search", "q_blocklist_match", "q_hash_classify",
        "q_classifier_eval", "q_warc_ingest", "q_snapshot_diff",
        "q_unigram_tokens")) {
      println(s"\n===================== $name =====================")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
