package graft

import graft.queries.{Oracles, Queries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and
  * §3 (oracle determinism strategy). One `queries` entry per implemented
  * operator; `oracleSql` holds the DuckDB twin of each.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Batch exact KNN — the core retrieval op of the reference
    * (faiss_utils.py:19-22). */
  def entry(spark: SparkSession): DataFrame =
    Queries.v1KnnL2(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // vector / retrieval core
    "v1_knn_l2" -> (Queries.v1KnnL2 _),
    "v2_knn_cosine" -> (Queries.v2KnnCosine _),
    "v3_vector_norms" -> (Queries.v3VectorNorms _),
    "v4_category_counts" -> (Queries.v4CategoryCounts _),
    "v5_per_class_sample" -> (Queries.v5PerClassSample _),
    "v6_ivf_assign" -> (Queries.v6IvfAssign _),
    "v7_ivf_search" -> (Queries.v7IvfSearch _),
    "v8_knn_join_meta" -> (Queries.v8KnnJoinMeta _),
    "v9_train_val_split" -> (Queries.v9TrainValSplit _),
    "v10_lsh_search" -> (Queries.v10LshSearch _),
    "v11_pq_adc" -> (Queries.v11PqAdc _),
    "v12_knn_category" -> (Queries.v12KnnCategory _),
    "v13_ivfpq_search" -> (Queries.v13IvfPqSearch _),
    "v14_class_centroid" -> (Queries.v14ClassCentroid _),
    "v16_rerank" -> (Queries.v16Rerank _),
    "v17_sq8_knn" -> (Queries.v17Sq8Knn _),
    "v18_lloyd_round" -> (Queries.v18LloydRound _),
    "v19_class_compactness" -> (Queries.v19ClassCompactness _),
    "v20_recall_eval" -> (Queries.v20RecallEval _),
    "v21_ivfpq_residual" -> (Queries.v21IvfPqResidual _),
    "v22_hamming_knn" -> (Queries.v22HammingKnn _),
    "v23_mips" -> (Queries.v23Mips _),
    "v24_range_search" -> (Queries.v24RangeSearch _),
    "v25_knn_classify" -> (Queries.v25KnnClassify _),
    "v26_lloyd_train" -> (Queries.v26LloydTrain _),
    "v27_ivf_upsert" -> (Queries.v27IvfUpsert _),
    "v28_knn_graph" -> (Queries.v28KnnGraph _),
    "v29_nn_descent" -> (Queries.v29NnDescent _),
    "v30_mutual_knn_clusters" -> (Queries.v30MutualKnnClusters _),
    "v31_opq_prerotate" -> (Queries.v31OpqPrerotate _),
    "v32_triplet_mine" -> (Queries.v32TripletMine _),
    "v33_dim_stats" -> (Queries.v33DimStats _),
    // dedup
    "d1_dedup_exact" -> (Queries.d1DedupExact _),
    "d2_minhash_pairs" -> (Queries.d2MinhashPairs _),
    "d3_simhash" -> (Queries.d3Simhash _),
    "d4_ngram_jaccard" -> (Queries.d4NgramJaccard _),
    "d5_embedding_dup" -> (Queries.d5EmbeddingDup _),
    "d6_simhash_dup" -> (Queries.d6SimhashDup _),
    "d7_dup_clusters" -> (Queries.d7DupClusters _),
    "p1_corpus_clean" -> (Queries.p1CorpusClean _),
    "d8_contamination" -> (Queries.d8Contamination _),
    "d9_incremental_dedup" -> (Queries.d9IncrementalDedup _),
    "d10_minhash_estimate" -> (Queries.d10MinhashEstimate _),
    "d11_overlap_pairs" -> (Queries.d11OverlapPairs _),
    "d12_edit_distance" -> (Queries.d12EditDistance _),
    "d13_band_cap" -> (Queries.d13BandCap _),
    "d14_simhash_cap" -> (Queries.d14SimhashCap _),
    "d15_prefix_dup" -> (Queries.d15PrefixDup _),
    // text analysis
    "t1_lang_id" -> (Queries.t1LangId _),
    "t2_quality_score" -> (Queries.t2QualityScore _),
    "t3_token_count" -> (Queries.t3TokenCount _),
    "t4_fingerprint" -> (Queries.t4Fingerprint _),
    "t5_top_terms" -> (Queries.t5TopTerms _),
    "t6_winnowing" -> (Queries.t6Winnowing _),
    "t7_length_quantiles" -> (Queries.t7LengthQuantiles _),
    "t8_tfidf" -> (Queries.t8Tfidf _),
    "t9_repetition" -> (Queries.t9Repetition _),
    "t10_lang_confusion" -> (Queries.t10LangConfusion _),
    "t11_normalize" -> (Queries.t11Normalize _),
    "t12_gopher_quality" -> (Queries.t12GopherQuality _),
    "t13_novelty" -> (Queries.t13Novelty _),
    "t14_hapax" -> (Queries.t14Hapax _),
    "t15_chunks" -> (Queries.t15Chunks _),
    "t16_bigram_lm" -> (Queries.t16BigramLm _),
    "p2_mixture_weights" -> (Queries.p2MixtureWeights _),
    "p3_clean_funnel" -> (Queries.p3CleanFunnel _),
    "p4_quota_sample" -> (Queries.p4QuotaSample _),
    "q10_small_qty_revenue" -> (Queries.q10SmallQtyRevenue _),
    "v15_filtered_knn" -> (Queries.v15FilteredKnn _),
    // multimodal
    "m1_binary_meta" -> (Queries.m1BinaryMeta _),
    "m2_decode_features" -> (Queries.m2DecodeFeatures _),
    "m3_shard_assign" -> (Queries.m3ShardAssign _),
    "m4_modality_stats" -> (Queries.m4ModalityStats _),
    "m5_frame_sample" -> (Queries.m5FrameSample _),
    "m6_pair_manifest" -> (Queries.m6PairManifest _),
    // relational analytics
    "q1_pricing_summary" -> (Queries.q1PricingSummary _),
    "q3_top_orders" -> (Queries.q3TopOrders _),
    "q4_late_priority" -> (Queries.q4LatePriority _),
    "q5_revenue_by_nation" -> (Queries.q5RevenueByNation _),
    "q6_forecast_revenue" -> (Queries.q6ForecastRevenue _),
    "q7_top_customers" -> (Queries.q7TopCustomers _),
    "q8_inactive_customers" -> (Queries.q8InactiveCustomers _),
    "q9_revenue_rollup" -> (Queries.q9RevenueRollup _),
    "q11_moving_avg" -> (Queries.q11MovingAvg _),
    "q12_market_share" -> (Queries.q12MarketShare _),
    "q13_balance_quartiles" -> (Queries.q13BalanceQuartiles _),
    "q14_balance_rank" -> (Queries.q14BalanceRank _),
    "q15_revenue_cube" -> (Queries.q15RevenueCube _),
    "q16_segment_setops" -> (Queries.q16SegmentSetOps _),
    "q17_brand_revenue" -> (Queries.q17BrandRevenue _),
    "q18_blame_supplier" -> (Queries.q18BlameSupplier _),
    "q19_order_count_dist" -> (Queries.q19OrderCountDist _),
    "q20_top_supplier" -> (Queries.q20TopSupplier _),
    "q21_lonely_customers" -> (Queries.q21LonelyCustomers _),
    "q22_top_balance" -> (Queries.q22TopBalance _),
    "q23_big_orders" -> (Queries.q23BigOrders _),
    "q24_promo_share" -> (Queries.q24PromoShare _),
    "q25_supplier_variety" -> (Queries.q25SupplierVariety _),
    // events
    "e1_event_window_agg" -> (Queries.e1EventWindowAgg _),
    "e2_sessionize" -> (Queries.e2Sessionize _),
    "e3_asof_join" -> (Queries.e3AsofJoin _),
    "e4_range_join" -> (Queries.e4RangeJoin _),
    "e5_funnel" -> (Queries.e5Funnel _),
    "e6_retention" -> (Queries.e6Retention _),
    "e7_json_props" -> (Queries.e7JsonProps _),
    "e8_event_pivot" -> (Queries.e8EventPivot _),
    "e9_skew_enrich" -> (Queries.e9SkewEnrich _),
    "e10_conversion_lag" -> (Queries.e10ConversionLag _),
    "e11_late_events" -> (Queries.e11LateEvents _),
    "e12_top_spenders" -> (Queries.e12TopSpenders _),
    "e13_sliding_dau" -> (Queries.e13SlidingDau _),
    "e14_cadence" -> (Queries.e14Cadence _),
    "e15_transitions" -> (Queries.e15Transitions _),
    "e16_spike_days" -> (Queries.e16SpikeDays _))

  def oracleSql: Map[String, String] = Oracles.sql
}
