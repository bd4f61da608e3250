package graft.queries

/** Pinned-constant fallback oracles — the safety net for any query that
  * ships without a handwritten genuine/spec-derived oracle. EMPTY as of
  * round 9: every query has a genuine DuckDB replay (LlmQueries/
  * TableQueries.oracles) or a hand-derived spec oracle (SpecOracles);
  * an entry reappearing here means a new query was registered without
  * one and should be upgraded.
  *
  * REGENERATE with `sbt "runMain graft.tools.OracleGen"` after any change
  * to engine semantics — do not edit by hand. */
object GeneratedOracles {
  val map: Map[String, String] = Map(
)
}
