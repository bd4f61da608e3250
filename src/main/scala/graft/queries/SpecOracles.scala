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
        |  TRUE AS distinct_eq_unique""".stripMargin)
}
