"""Operator surface. Import from the submodules:

  rules       apply_rules, compile_rule_columns
  extract     extract_pages (pandas/Arrow), extract_pages_native
  enrich      insert_attrs_if_absent, apply_semconv_mappings, join_dims
  route       assign_sink, write_routed_single_pass, write_per_sink_tables,
              salted_repartition
  metrics     rule_effectiveness, cardinality_summary, metrics_manifest
  exporters   debug_sample, write_with_rotation, duration_histogram
  dedup       exact_dedup_groups, dedup_exact, minhash_lsh_pairs,
              simhash64/simhash_pairs, ngram_jaccard_pairs
  similarity  topk_brute_force(_pandas), topk_lsh, cosine
  text        ws/regex token counts, quality_features, lang_id,
              word_shingles, minhash_signature, doc_fingerprint
  multimodal  synthetic_media, decode_and_featurize, frame_sample_plan
"""
