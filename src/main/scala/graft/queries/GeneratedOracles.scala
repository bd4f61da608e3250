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
    "q_dedup_cosine_lsh" ->
      """SELECT CAST(24 AS BIGINT) AS n_pairs,
  CAST(4262 AS BIGINT) AS sum_a,
  CAST(8322 AS BIGINT) AS sum_b""",
    "q_dedup_minhash" ->
      """SELECT CAST(25 AS BIGINT) AS n_pairs,
  CAST(4051 AS BIGINT) AS sum_a,
  CAST(8907 AS BIGINT) AS sum_b""",
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
    "q_gen_stream_rate" ->
      """SELECT CAST(2000 AS BIGINT) AS n,
  CAST(101546 AS BIGINT) AS sum_v,
  CAST(1017 AS BIGINT) AS n_a,
  TRUE AS ts_epoch""",
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
