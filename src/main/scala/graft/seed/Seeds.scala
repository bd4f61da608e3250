package graft.seed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic seed plumbing.
  *
  * Every generated cell value is a pure function of
  * `(globalSeed, tableName, columnName, rowId)`:
  *
  *   columnSeed = deriveColumnSeed(globalSeed, table, column)   // driver
  *   cellSeed   = xxhash64(lit(columnSeed), rowId)              // executor
  *
  * This is the property that makes generation partition-independent (no RNG
  * state), so it scales linearly: repartitioning, retries and speculative
  * execution cannot change values. Semantics follow the reference's core
  * engine (dbldatagen/core/engine/seed.py:26-122) without copying code.
  */
object Seeds {

  /** 2^53 — largest span where a double keeps integer exactness. */
  val FractionDenominator: Long = 1L << 53

  /** Golden-ratio 64-bit constant for decorrelating derived seeds
    * (public-domain splitmix64 increment). */
  val GoldenGamma: Long = 0x9E3779B97F4A7C15L

  val NullMaskXor: Long = 0xDEADBEEFL

  /** Driver-side column seed: polynomial rolling hash of the table name
    * (x31) and column name (x37) folded with the global seed, wrapping in
    * two's-complement Long arithmetic. */
  def deriveColumnSeed(globalSeed: Long, table: String, column: String): Long = {
    var h = globalSeed
    var i = 0
    while (i < table.length) { h = h * 31L + table.charAt(i).toLong; i += 1 }
    while (i < table.length + column.length) {
      h = h * 37L + column.charAt(i - table.length).toLong; i += 1
    }
    h
  }

  /** Decorrelated sub-seed k of a column seed (for multi-draw generators —
    * Box-Muller's two uniforms, array elements, per-char picks). */
  def subSeed(columnSeed: Long, k: Int): Long =
    columnSeed + GoldenGamma * (k.toLong + 1L)

  /** Per-cell 64-bit seed: xxhash64 of the column seed and the row id (or a
    * substitute seed column for seed_from correlation). */
  def cellSeed(columnSeed: Long, id: Column): Column =
    xxhash64(lit(columnSeed), id)

  /** Uniform fraction in [0, 1): pmod into [0, 2^53) then scale. Exact in
    * double space; ANSI-safe (no abs(Long.MinValue) overflow). */
  def uniformFraction(seed: Column): Column =
    pmod(seed, lit(FractionDenominator)).cast("double") / lit(FractionDenominator.toDouble)

  /** Uniform fraction drawn directly from (columnSeed, id). */
  def uniformFraction(columnSeed: Long, id: Column): Column =
    uniformFraction(cellSeed(columnSeed, id))

  /** Raw-values array for SeedMode.FromColumnValues: the base columns
    * rendered to strings (nulls stay null), matching the reference's
    * `array(string(ifnull(col, null)), ...)` seed shape
    * (column_generation_spec.py:1285-1289). */
  def rawValuesArray(cols: Seq[String]): Column =
    array(cols.map(c => col(c).cast("string")): _*)

  /** Null mask: wrap `value` so that a `fraction` share of rows (chosen by a
    * decorrelated hash so nullness never correlates with the value) is NULL.
    * Ref semantics: core/engine/seed.py:79-107. */
  def withNullMask(value: Column, fraction: Double, columnSeed: Long, id: Column): Column =
    if (fraction <= 0.0) value
    else {
      val u = uniformFraction(cellSeed(columnSeed ^ NullMaskXor, id))
      when(u < lit(fraction), lit(null)).otherwise(value)
    }
}
