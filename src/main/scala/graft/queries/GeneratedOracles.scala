package graft.queries

/** Pinned-constant oracles for the deterministic generator/sketch queries
  * (generation is a pure function of seed+rowId, so their outputs are
  * compile-time constants; the meaningful regression guards are the
  * invariant BOOLEAN columns inside each query).
  *
  * REGENERATE with `sbt "runMain graft.tools.OracleGen"` after any change
  * to engine semantics — do not edit by hand. */
object GeneratedOracles {
  val map: Map[String, String] = Map(
    "q_analyzer_script_data" ->
      """SELECT TRUE AS has_fields,
  TRUE AS has_range,
  CAST(5 AS BIGINT) AS n_lines""",
    "q_analyzer_script_schema" ->
      """SELECT TRUE AS has_all_fields,
  TRUE AS mentions_generator,
  CAST(13 AS BIGINT) AS n_lines""",
    "q_api_iot_fluent" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
  CAST(6 AS BIGINT) AS cols,
  TRUE AS device_shape,
  TRUE AS device_cardinality,
  TRUE AS model_shape,
  TRUE AS line_functional,
  TRUE AS country_in_set,
  TRUE AS us_share_10pct,
  TRUE AS ts_minute,
  TRUE AS ts_bounds""",
    "q_api_schema_specs" ->
      """SELECT CAST(8000 AS BIGINT) AS n,
  CAST(4 AS BIGINT) AS cols,
  TRUE AS scores_in_unit,
  TRUE AS scores_differ,
  TRUE AS labels_ok,
  TRUE AS id_seq""",
    "q_dataset_geometries" ->
      """SELECT CAST(5000 AS BIGINT) AS n,
  CAST(3000 AS BIGINT) AS points_ok,
  CAST(2000 AS BIGINT) AS polys_ok""",
    "q_dataset_process_historian" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
  TRUE AS quality_set,
  TRUE AS mostly_good,
  TRUE AS value_bounds,
  TRUE AS value_centered,
  TRUE AS tag_shape""",
    "q_dataset_sales_order" ->
      """SELECT CAST(20000 AS BIGINT) AS n_lines,
  CAST(0 AS BIGINT) AS orphans,
  TRUE AS invoice_covers_lines,
  TRUE AS qty_bounds,
  TRUE AS customers_valid,
  TRUE AS prices_valid""",
    "q_dataset_stock_ticker" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
  CAST(50 AS BIGINT) AS symbols,
  TRUE AS symbol_shape,
  TRUE AS hl_ordered,
  TRUE AS dates_per_symbol,
  TRUE AS volume_pos""",
    "q_dataset_telematics" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
  TRUE AS devices_le,
  TRUE AS lat_bounds,
  TRUE AS lon_bounds,
  TRUE AS speed_bounds,
  TRUE AS heading_bounds,
  TRUE AS mostly_on""",
    "q_dataset_user" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
  CAST(10000 AS BIGINT) AS id_distinct,
  TRUE AS email_shape,
  TRUE AS ip_shape,
  TRUE AS phone_shape""",
    "q_dedup_cosine_lsh" ->
      """SELECT CAST(24 AS BIGINT) AS n_pairs,
  CAST(4262 AS BIGINT) AS sum_a,
  CAST(8322 AS BIGINT) AS sum_b""",
    "q_dedup_minhash" ->
      """SELECT CAST(25 AS BIGINT) AS n_pairs,
  CAST(4051 AS BIGINT) AS sum_a,
  CAST(8907 AS BIGINT) AS sum_b""",
    "q_dedup_minhash_cc" ->
      """SELECT CAST(12 AS BIGINT) AS n_planted,
  TRUE AS chain_map_ok,
  TRUE AS n_components_ok,
  CAST(3 AS BIGINT) AS n_clusters_with_survivor,
  TRUE AS one_survivor_per_cluster,
  TRUE AS survivor_is_min""",
    "q_dedup_minhash_drop" ->
      """SELECT CAST(476 AS BIGINT) AS n_survivors""",
    "q_dedup_ngram_jaccard" ->
      """SELECT CAST(25 AS BIGINT) AS n_pairs,
  CAST(4051 AS BIGINT) AS sum_a,
  CAST(8907 AS BIGINT) AS sum_b""",
    "q_dedup_simhash" ->
      """SELECT CAST(17 AS BIGINT) AS n_pairs,
  CAST(3224 AS BIGINT) AS sum_a,
  CAST(6029 AS BIGINT) AS sum_b""",
    "q_gen_array_feature" ->
      """SELECT CAST(5000 AS BIGINT) AS n,
  TRUE AS all_len4,
  TRUE AS in_bounds""",
    "q_gen_array_of" ->
      """SELECT CAST(5000 AS BIGINT) AS n,
  TRUE AS len_in_bounds,
  TRUE AS elems_in_bounds,
  CAST(5 AS BIGINT) AS n_lens""",
    "q_gen_constraints" ->
      """SELECT CAST(5244 AS BIGINT) AS n,
  TRUE AS all_valid""",
    "q_gen_dataset_groupby" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
  CAST(50 AS BIGINT) AS id4_groups,
  TRUE AS v1_in_bounds,
  TRUE AS v2_in_bounds,
  TRUE AS id1_shape""",
    "q_gen_dataset_options" ->
      """SELECT TRUE AS rejects_unknown,
  TRUE AS accepts_known,
  TRUE AS describe_lists_options,
  CAST(8 AS BIGINT) AS catalog_size""",
    "q_gen_dataset_telephony" ->
      """SELECT CAST(8000 AS BIGINT) AS n,
  CAST(0 AS BIGINT) AS orphans,
  TRUE AS types_ok""",
    "q_gen_faker" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
  TRUE AS email_ok,
  TRUE AS name_ok,
  CAST(4287 AS BIGINT) AS n_emails""",
    "q_gen_faker_breadth" ->
      """SELECT CAST(5000 AS BIGINT) AS n,
  TRUE AS locales_differ,
  TRUE AS it_from_pool,
  TRUE AS ja_shape,
  TRUE AS pl_city_nonempty,
  TRUE AS postcode_shape,
  TRUE AS user_shape,
  TRUE AS ip_shape,
  TRUE AS job_state_nonempty""",
    "q_gen_fk_null_fraction" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
  CAST(2110 AS BIGINT) AS n_null,
  CAST(0 AS BIGINT) AS orphans,
  TRUE AS null_frac_ok""",
    "q_gen_fk_pattern_zipf" ->
      """SELECT CAST(9000 AS BIGINT) AS n,
  CAST(0 AS BIGINT) AS orphans,
  TRUE AS skewed""",
    "q_gen_fk_uuid" ->
      """SELECT CAST(6000 AS BIGINT) AS n,
  CAST(0 AS BIGINT) AS orphans""",
    "q_gen_percent_nulls" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
  CAST(3131 AS BIGINT) AS n_null,
  TRUE AS within_2pct""",
    "q_gen_plugin" ->
      """SELECT CAST(2000 AS BIGINT) AS n,
  TRUE AS shape_ok,
  CAST(97 AS BIGINT) AS n_distinct""",
    "q_gen_random_mode" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
  TRUE AS in_range,
  TRUE AS in_set,
  TRUE AS repeatable_hash,
  TRUE AS decoupled,
  TRUE AS decorrelated,
  TRUE AS spread,
  TRUE AS repeatable_fixed""",
    "q_gen_scatter" ->
      """SELECT CAST(5000 AS BIGINT) AS n,
  CAST(3161 AS BIGINT) AS plain_distinct,
  CAST(3161 AS BIGINT) AS scat_distinct,
  TRUE AS differs""",
    "q_gen_script_table" ->
      """SELECT 'CREATE TABLE graft_tbl (' || chr(10) || '    k BIGINT,' || chr(10) || '    v STRING' || chr(10) || ')' || chr(10) || 'USING parquet' AS ddl,
  CAST(181 AS BIGINT) AS merge_len""",
    "q_gen_seed_from_columns" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
  CAST(6 AS BIGINT) AS n_h,
  TRUE AS functional""",
    "q_gen_seed_from_value" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
  TRUE AS functional""",
    "q_gen_seed_raw_values" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
  TRUE AS stringly_equal,
  TRUE AS native_hash_differs,
  TRUE AS functional,
  TRUE AS label_spliced""",
    "q_gen_serialization" ->
      """SELECT CAST(5000 AS BIGINT) AS n_orders,
  TRUE AS roundtrip_ok,
  CAST(0 AS BIGINT) AS total_orphans""",
    "q_gen_stream_parquet" ->
      """SELECT CAST(500 AS BIGINT) AS n,
  CAST(500 AS BIGINT) AS n_docs""",
    "q_gen_struct" ->
      """SELECT CAST(5000 AS BIGINT) AS n,
  TRUE AS a_in_bounds,
  CAST(3 AS BIGINT) AS n_b""",
    "q_gen_struct_json" ->
      """SELECT CAST(3000 AS BIGINT) AS n,
  TRUE AS json_shape""",
    "q_gen_unique_combinations" ->
      """SELECT CAST(12 AS BIGINT) AS n,
  TRUE AS le_12""",
    "q_multimodal_decode" ->
      """SELECT CAST(500 AS BIGINT) AS n,
  CAST(500 AS BIGINT) AS n_decoded,
  CAST(500 AS BIGINT) AS n_resized_ok,
  CAST(2000 AS BIGINT) AS n_frames,
  CAST(8000 AS BIGINT) AS n_embdim""",
    "q_text_fingerprint" ->
      """SELECT CAST(500 AS BIGINT) AS n_fp,
  CAST(27165 AS BIGINT) AS n_subwords""",
    "q_text_langid" ->
      """SELECT * FROM (VALUES
  ('de', 'en', CAST(51 AS BIGINT)),
  ('de', 'und', CAST(19 AS BIGINT)),
  ('en', 'en', CAST(160 AS BIGINT)),
  ('en', 'und', CAST(58 AS BIGINT)),
  ('es', 'en', CAST(57 AS BIGINT)),
  ('es', 'und', CAST(16 AS BIGINT)),
  ('fr', 'en', CAST(51 AS BIGINT)),
  ('fr', 'und', CAST(13 AS BIGINT)),
  ('zh', 'en', CAST(63 AS BIGINT)),
  ('zh', 'und', CAST(12 AS BIGINT)))
  AS t(lang, lang_pred, n)
ORDER BY lang, lang_pred, n""")
}
