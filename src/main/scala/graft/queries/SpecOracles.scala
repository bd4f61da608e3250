package graft.queries

/** Handwritten, spec-derived oracles for generator queries — each value
  * below is computed BY HAND from the query's column specs, not captured
  * from an engine run (unlike [[GeneratedOracles]], which pins whatever the
  * engine produced and therefore self-certifies engine semantics). If the
  * engine drifts from the documented semantics, these rows disagree and the
  * driver's DuckDB compare fails.
  *
  * Derivations:
  *  - Sequence(start, step) over N rows: values start, start+step, ...,
  *    start+step*(N-1) — exactly N distinct, min=start, max=start+step*(N-1).
  *  - Expression columns are checked by boolean invariants inside the query;
  *    the oracle asserts the invariant MUST be true and the row count.
  *  - Coupon-collector counts (all k values hit across n >> k uniform
  *    draws): miss probability <= k*(1-1/k)^n, vanishingly small for every
  *    pair used here (worst case 500*(1-1/500)^8000 ~ 5e-5), and the
  *    deterministic engine freezes the draw, so the exact count is stable.
  *  - UUID distinctness: 128 bits of hash per row; collision probability
  *    across 20000 rows ~ 2e8 / 2^128 ~ 1e-30.
  */
object SpecOracles {
  val map: Map[String, String] = Map(

    // spark.range(0, 12345) identity ids: n = distinct = 12345, ids 0..12344.
    "q_gen_source_batch" ->
      """SELECT CAST(12345 AS BIGINT) AS n,
        |  CAST(12345 AS BIGINT) AS n_distinct,
        |  CAST(0 AS BIGINT) AS min_id,
        |  CAST(12344 AS BIGINT) AS max_id""".stripMargin,

    // Sequence(100, 7) over 10000 rows: min 100, max 100 + 7*9999 = 70093.
    "q_gen_sequence" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
        |  CAST(10000 AS BIGINT) AS n_distinct,
        |  CAST(100 AS BIGINT) AS min_k,
        |  CAST(70093 AS BIGINT) AS max_k,
        |  TRUE AS on_step""".stripMargin,

    // Generation is a pure function of (seed, rowId): 3-partition and
    // 13-partition builds of 5000 rows must join 1:1 and agree everywhere.
    "q_gen_partition_independence" ->
      """SELECT CAST(5000 AS BIGINT) AS n,
        |  TRUE AS identical""".stripMargin,

    // 777 rows of default Sequence() (start=1): min k = 1.
    "q_gen_view_registration" ->
      """SELECT CAST(777 AS BIGINT) AS n,
        |  CAST(1 AS BIGINT) AS min_k""".stripMargin,

    // b = a*2+1 and cc = b*b-a by definition; 8000 rows.
    "q_gen_expression_phases" ->
      """SELECT CAST(8000 AS BIGINT) AS n,
        |  TRUE AS b_ok,
        |  TRUE AS c_ok""".stripMargin,

    // One omitted intermediate + one derived output column = 1 output
    // column; shown = hidden*10 is always a multiple of 10.
    "q_gen_omit" ->
      """SELECT CAST(1000 AS BIGINT) AS n,
        |  CAST(1 AS BIGINT) AS cols,
        |  TRUE AS derived_ok""".stripMargin,

    // Constant('fixed') over 2500 rows groups to exactly one row.
    "q_gen_constant" ->
      """SELECT 'fixed' AS k,
        |  CAST(2500 AS BIGINT) AS n""".stripMargin,

    // 20000 128-bit deterministic UUIDs: distinct (collision ~ 1e-30),
    // 8-4-4-4-12 lowercase hex shape by construction.
    "q_gen_uuid" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  CAST(20000 AS BIGINT) AS n_distinct,
        |  TRUE AS shape_ok""".stripMargin,

    // prefix 'ORD' + default '_' separator; suffix 'X' with '-' separator;
    // %05d zero-pads to width >= 5.
    "q_gen_prefix_suffix_format" ->
      """SELECT CAST(5000 AS BIGINT) AS n,
        |  TRUE AS a_ok,
        |  TRUE AS b_ok,
        |  TRUE AS f_ok""".stripMargin,

    // FK values are reconstructed from the parent Sequence lattice, so
    // orphans = 0 by construction; all 500 parents hit across 8000 uniform
    // draws (miss probability ~ 5e-5, frozen by the deterministic engine).
    "q_gen_fk_sequence" ->
      """SELECT CAST(8000 AS BIGINT) AS n,
        |  CAST(0 AS BIGINT) AS orphans,
        |  CAST(500 AS BIGINT) AS n_parents_hit""".stripMargin,

    // numColumns=3 expands to f_0..f_2; 5000 iid continuous triples
    // collide with probability ~ 0 => > 4900 distinct.
    "q_gen_multicolumn" ->
      """SELECT CAST(5000 AS BIGINT) AS n,
        |  CAST(3 AS BIGINT) AS cols,
        |  TRUE AS decorrelated""".stripMargin,

    // Sequence(5, 3) over 999 rows round-tripped through parquet:
    // min 5, max 5 + 3*998 = 2999; all 3 values of a 3-value column hit
    // (miss probability ~ 3*(2/3)^999 ~ 1e-176).
    "q_gen_sink_roundtrip" ->
      """SELECT CAST(999 AS BIGINT) AS n,
        |  CAST(5 AS BIGINT) AS min_k,
        |  CAST(2999 AS BIGINT) AS max_k,
        |  CAST(3 AS BIGINT) AS n_vals""".stripMargin,

    // uniqueValues=100 clamps the lattice to exactly 100 values; 30000
    // draws hit all of them (miss probability ~ 100*e^-300).
    "q_gen_unique_clamp" ->
      """SELECT CAST(30000 AS BIGINT) AS n,
        |  CAST(100 AS BIGINT) AS n_distinct,
        |  TRUE AS distinct_eq_unique""".stripMargin,

    // ------------------------------------------------------ distributions
    // Each q_dist_* query reduces 20000 lattice draws to BOOLEAN shape
    // properties; the expected bucket masses are derived from the law's
    // inverse-CDF math (derivations in GenQueries.distQueries) and the
    // bands are >= 6 binomial sigmas wide, so TRUE is certain for a correct
    // law and violated for a wrong one.
    "q_dist_uniform" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  TRUE AS in_range,
        |  TRUE AS balanced""".stripMargin,
    "q_dist_normal" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  TRUE AS in_range,
        |  TRUE AS middle_heavy,
        |  TRUE AS tails_small,
        |  TRUE AS symmetric""".stripMargin,
    "q_dist_zipf" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  TRUE AS in_range,
        |  TRUE AS monotone,
        |  TRUE AS head_mass""".stripMargin,
    "q_dist_exponential" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  TRUE AS in_range,
        |  TRUE AS monotone,
        |  TRUE AS head_mass""".stripMargin,
    "q_dist_lognormal" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  TRUE AS in_range,
        |  TRUE AS decreasing_head,
        |  TRUE AS head_mass,
        |  TRUE AS clamp_tail_small""".stripMargin,
    "q_dist_gamma" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  TRUE AS in_range,
        |  TRUE AS head_mass,
        |  TRUE AS b1_mass,
        |  TRUE AS b2_mass,
        |  TRUE AS tail_tiny""".stripMargin,
    "q_dist_beta" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  TRUE AS in_range,
        |  TRUE AS mode_second,
        |  TRUE AS decreasing_tail,
        |  TRUE AS masses""".stripMargin,
    "q_dist_pareto" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  TRUE AS in_range,
        |  TRUE AS monotone,
        |  TRUE AS head_mass""".stripMargin,
    // Largest-remainder slot quantization is exact, so expected counts are
    // exactly 20000 * weight; each count is Binomial with sigma <= 69 and
    // the band is ±500 (±7 sigma).
    "q_dist_weighted" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  TRUE AS a_ok,
        |  TRUE AS b_ok,
        |  TRUE AS c_ok,
        |  TRUE AS d_ok,
        |  TRUE AS total_ok""".stripMargin,

    // ------------------------------------------------------ ranges/lattices
    // Range(10, 50, step 4): lattice {10,14,...,50}, 11 values; all hit
    // across 20000 uniform draws (miss probability ~ 11*(10/11)^20000).
    "q_gen_range_int" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  CAST(11 AS BIGINT) AS n_distinct,
        |  CAST(10 AS BIGINT) AS min_v,
        |  CAST(50 AS BIGINT) AS max_v,
        |  TRUE AS in_bounds,
        |  TRUE AS on_step""".stripMargin,
    // Range(1, 100, step 0.25) as decimal(10,2): (100-1)/0.25+1 = 397
    // lattice points, all hit across 10000 draws (miss ~ 397*e^-25.2);
    // endpoints render as '1.00'/'100.00' at scale 2.
    "q_gen_range_decimal" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
        |  CAST(397 AS BIGINT) AS n_distinct,
        |  '1.00' AS min_v,
        |  '100.00' AS max_v,
        |  TRUE AS on_step""".stripMargin,
    // Continuous uniform over [-5,5): quarters are Binomial(20000, 0.25),
    // band ±400 = ±6.5 sigma.
    "q_gen_range_continuous" ->
      """SELECT CAST(20000 AS BIGINT) AS n,
        |  TRUE AS in_bounds,
        |  TRUE AS balanced""".stripMargin,
    // DateRange(2024-01-01, 2024-12-31, step 7 days): multiples of 7 up to
    // 364 -> 53 lattice dates, all hit across 10000 draws (miss ~
    // 53*e^-188); max = 2024-01-01 + 364d = 2024-12-30 (2024 is a leap
    // year, 366 days, so day 364 lands on Dec 30).
    "q_gen_daterange" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
        |  CAST(53 AS BIGINT) AS n_distinct,
        |  '2024-01-01' AS min_dt,
        |  '2024-12-30' AS max_dt,
        |  TRUE AS on_week""".stripMargin,
    // 44640-minute lattice (31 days), 10000 uniform draws:
    // P(no draw in first/last hour) = (1-60/44640)^10000 = e^-13.4;
    // E[distinct] = 44640*(1-e^(-10000/44640)) = 8955, sigma ~ 40.
    "q_gen_timestamp" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
        |  TRUE AS min_near_start,
        |  TRUE AS max_near_end,
        |  TRUE AS distinct_band,
        |  TRUE AS minute_aligned,
        |  TRUE AS in_bounds""".stripMargin,

    // ------------------------------------------------------ text shapes
    // {seq:6} embeds the 1-based row number, so every row is distinct by
    // construction; remaining placeholders are shape-checked by regex.
    "q_gen_pattern" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
        |  CAST(10000 AS BIGINT) AS n_distinct,
        |  TRUE AS shape_ok""".stripMargin,
    // Template outputs are pure shape checks (regex per char class) plus
    // the 3-way alternation covering all branches across 10000 draws
    // (miss probability ~ 3*(2/3)^10000).
    "q_gen_template" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
        |  TRUE AS t1_ok,
        |  TRUE AS t2_ok,
        |  TRUE AS t3_ok,
        |  TRUE AS t3_all_alternatives""".stripMargin,
    "q_gen_template_base" ->
      """SELECT CAST(5000 AS BIGINT) AS n,
        |  TRUE AS base_ok,
        |  TRUE AS base_matches""".stripMargin,
    // ILText(1-2 paragraphs, 2-3 sentences, 3-6 words from a 63-word pool):
    // >= 63^6 ~ 2^35.8 equally-likely word sequences per row, so expected
    // collisions among 3000 rows ~ 3000^2 / 2^36.8 < 0.1 — a 2900
    // distinct-count floor leaves a 100-collision margin.
    "q_gen_iltext" ->
      """SELECT CAST(3000 AS BIGINT) AS n,
        |  TRUE AS ends_period,
        |  TRUE AS capitalized,
        |  TRUE AS charset_ok,
        |  TRUE AS high_variety""".stripMargin,

    // ------------------------------------------------------ values lists
    // 3 unweighted values: Binomial(9000, 1/3), E=3000, sigma=44.7, band
    // ±350; total_ok pins that nothing outside the list appears.
    "q_gen_values" ->
      """SELECT CAST(9000 AS BIGINT) AS n,
        |  TRUE AS balanced,
        |  TRUE AS total_ok""".stripMargin,
    // Weighted 0.6/0.3/0.1 over 30000 rows: the reference's 10% contract
    // (function_builder.py:59-63) is ±21 sigma here.
    "q_gen_values_weighted" ->
      """SELECT CAST(30000 AS BIGINT) AS n,
        |  TRUE AS x_within_10pct,
        |  TRUE AS y_within_10pct,
        |  TRUE AS z_within_10pct,
        |  TRUE AS total_ok""".stripMargin)
}
