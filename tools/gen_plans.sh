#!/bin/bash
# Regenerate PLANS.md: scale-relevant physical-plan lines for the
# headline queries. Requires compiled classes (sbt compile).
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
QUERIES="p4_in_filter a1_avg join_star_region w2_rolling_avg7 sim_topk \
dedup_minhash_lsh c2_upsert_lww join_asof join_range join_bloom_semi \
skew_join_salted t_tfidf_top a13_equifreq_bins o5_minmax_skipping \
sim_lsh_ann_bucketed w10_range_frame graph_pagerank dedup_sorted_neighborhood \
t_cooccur sim_triplet_mine t_oov_rate mm_decode_png o6_topk_per_key \
dedup_prefix_join t_weighted_sample w11_ewma c7_scd2_intervals \
dedup_fuzzy_block s12_binaryfile_scan t_bigram_lm dedup_containment \
dedup_segments dedup_semantic sim_pq_ann join_point_in_time \
graph_triangles a16_ols mm_phash_dedup t_bpe_apply \
dedup_keep_best sim_range_search t_epoch_shuffle a17_approx_topk \
e_top_paths t_shingle_explode \
w12_interval_merge a18_mad_outliers t_curate_e2e a19_corr_matrix \
sim_ivf_ann_bucketed s13_text_scan \
join_dpp_pruned dq_audit t_inverted_index t_bm25 t_lm_bucket_sample \
sim_mips s15_gdx_roundtrip join_null_safe c10_join_ivm e_funnel_windowed \
w16_rolling_anomaly a23_spearman sim_class_separation dq_skew_report \
w17_rolling_median w18_rolling_corr e_attribution t_feature_hash \
s17_xml_roundtrip s18_dynamic_partition_overwrite s19_gdx_time_travel \
t_quality_classifier t_fim_split a25_ks_drift a26_ab_ttest \
sim_prefix_dim_eval w19_autocorr7 t_token_dropout c11_compact_roundtrip \
e_rfm_segmentation w20_seasonal_index a27_benford a28_gini set_except_all \
tpch_q4 tpch_q18 dedup_pipeline tpch_q7 tpch_q8 tpch_q10 tpch_q13 \
tpch_q14 tpch_q15 tpch_q17 tpch_q19 tpch_q21 tpch_q22 t_fingerprint_roll \
dedup_dup_spans t_strip_dup_spans sql_window_frames tpch_q9 tpch_q12 \
tpch_q2 tpch_q11 tpch_q16 tpch_q20 mm_tile_features mm_audio_features \
c13_gdx_upsert c14_gdx_delete c15_mv_rewrite s23_gdx_schema_evolution \
c16_mv_incremental_refresh c17_gdx_update c18_gdx_sql_dml c19_mv_join_rewrite \
c21_mv_sketch_rewrite c20_gdx_zorder s27_gdx_bloom_lookup \
c22_gdx_constraints c23_mv_kll_rewrite a29_kll_partitioned c24_mv_sql \
s28_gdx_sql_time_travel c26_mv_auto_heal c25_gdx_column_mapping \
s29_gdx_partitioned s30_gdx_spj s31_gdx_meta_groupby \
s32_gdx_bucket_spj c27_gdx_catalog_sql s33_gdx_meta_sum \
s34_gdx_metadata_tables s35_gdx_topn s36_gdx_changes_sql \
c28_gdx_clone_sql s37_gdx_replace_where s38_gdx_truncate_sql \
c29_gdx_rtas c30_gdx_merge_matrix s39_gdx_days_partition \
c31_gdx_partition_evolution c32_gdx_tags \
c33_gdx_merge_evolution s40_gdx_compact_small \
c34_gdx_typed_columns c35_gdx_branch_wap s41_gdx_temporal_transforms \
c36_gdx_multi_table_txn stream_gdx_catalog_feed c37_gdx_embedding_column \
c38_gdx_cbo_stats c39_gdx_map_column c40_gdx_histogram_stats \
c41_gdx_default_values stream_gdx_wap s42_gdx_cluster_by \
s43_gdx_describe_detail c42_gdx_struct_column c43_gdx_txn_sql \
c44_gdx_struct_governance c45_gdx_conversation_column c46_gdx_txn_dml \
c47_gdx_struct_map_column t_chat_template c48_gdx_real_text \
c49_gdx_tool_calls s44_gdx_string_skipping c50_gdx_variant_column \
t_variant_profile \
s45_gdx_variant_shred"
{
  echo "# PLANS — physical-plan audit of headline queries ($SF)"
  echo
  echo "Auto-generated from \`graft.Smoke <query>\` formatted explains: the"
  echo "scale-relevant lines (scan pushdown, exchanges, codegen, join strategies)."
  echo "Regenerate: \`tools/gen_plans.sh\`."
  for q in $QUERIES; do
    echo; echo "## $q"; echo '```'
    java $ADD_OPENS -Dfile.encoding=UTF-8 -Xmx8g \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Smoke "$q" "$SF" 2>/dev/null \
      | grep -E '^\([0-9]+\) |PushedFilters|PartitionFilters|ReadSchema' \
      | grep -vE 'PushedFilters: \[\]' | head -40
    echo '```'
  done
} > PLANS.md
echo "wrote PLANS.md"
