package graft.spec

import org.apache.spark.sql.types._

/** Plan ADT for the graft synthetic-data engine.
  *
  * Mirrors the *capabilities* of the reference's declarative model
  * (reference: dbldatagen/core/spec/schema.py:832-1456) as idiomatic sealed
  * Scala traits. Every strategy compiles to a pure
  * `org.apache.spark.sql.Column` expression over a `spark.range(n)` base —
  * deterministic functions of (globalSeed, table, column, rowId), with no RNG
  * state, so generation is partition-independent and embarrassingly parallel
  * at any scale.
  */

/** Statistical distribution used to map a per-cell hash to an index in
  * `[0, n)` or a fraction in `[0, 1)`.
  * Reference semantics: dbldatagen/core/engine/distributions.py:45-240.
  */
sealed trait Distribution
object Distribution {
  case object Uniform extends Distribution
  /** Box-Muller normal; in index space centered at (n-1)/2 with std n/6. */
  final case class Normal(mean: Option[Double] = None, stddev: Option[Double] = None) extends Distribution
  /** Bounded power-law: low indexes heavily favored. alpha > 1. */
  final case class Zipf(alpha: Double) extends Distribution
  /** Exponential decay over the index range; rate > 0. */
  final case class Exponential(rate: Double) extends Distribution
  /** exp(Normal(mu, sigma)) scaled into the index range. */
  final case class LogNormal(mu: Double, sigma: Double) extends Distribution
  /** Gamma(shape, scale) via the exact inverse regularized incomplete
    * gamma (DistKernels quantile kernel). */
  final case class Gamma(shape: Double, scale: Double) extends Distribution
  /** Beta(alpha, beta) via the exact inverse regularized incomplete beta
    * (DistKernels quantile kernel). */
  final case class Beta(alpha: Double, beta: Double) extends Distribution
  /** Pareto heavy tail via inverse CDF `(1-u)^(-1/alpha) - 1`, scaled so the
    * mode sits at index 0 and the tail covers the range; alpha > 0.
    * Ref: dbldatagen/distributions/pareto.py:21-98. */
  final case class Pareto(alpha: Double) extends Distribution
}

/** How `random = true` columns seed Spark's `rand()` — the legacy
  * non-derived generation mode, where values are drawn from a per-partition
  * RNG stream instead of being a pure function of the row id.
  * Reference: data_generator.py:172-198 (randomSeedMethod),
  * column_generation_spec.py:946-992 (rand()/rand(seed)/rand(hash('name'))).
  */
sealed trait RandomSeedMethod
object RandomSeedMethod {
  /** `rand(globalSeed)` — repeatable per run; note that two random columns
    * share one seed and therefore draw identical streams (reference parity:
    * this is why HashFieldName is the default). */
  case object Fixed extends RandomSeedMethod
  /** `rand(hash(columnName))` — repeatable per run, decorrelated across
    * columns (reference default when no explicit seed is supplied). */
  case object HashFieldName extends RandomSeedMethod
  /** `rand()` — a fresh arbitrary seed every build (not repeatable). */
  case object Arbitrary extends RandomSeedMethod
}

/** How a column derives its per-cell seed.
  * Reference: legacy baseColumnType auto/values/hash —
  * dbldatagen/column_generation_spec.py:56-66,1268-1294; core seed_from —
  * dbldatagen/core/engine/generator.py:215-250.
  */
sealed trait SeedMode
object SeedMode {
  /** Seed from the synthetic row id (default; partition-independent). */
  case object RowId extends SeedMode
  /** Seed from the values of other columns (hash of them). */
  final case class FromColumns(cols: Seq[String]) extends SeedMode
  /** Seed from the *stringified* values of other columns — the reference's
    * `baseColumnType="values"` / raw_values array mode: correlation keys on
    * the rendered string values (so an int 7 and the string "7" correlate),
    * and Template `\v0`..`\v9` placeholders index the individual values.
    * Ref: column_generation_spec.py:1268-1294. */
  final case class FromColumnValues(cols: Seq[String]) extends SeedMode
  /** Seed from another column's raw value (value-correlation). */
  final case class FromValue(col: String) extends SeedMode
}

/** One generated column. */
sealed trait ColumnStrategy
object ColumnStrategy {
  /** Monotonic `id*step + start` — primary-key friendly.
    * Ref: core/engine/columns/pk.py:12-28. */
  final case class Sequence(start: Long = 1L, step: Long = 1L) extends ColumnStrategy

  /** Value on the lattice `{min, min+step, ..., max}` (integral types) or the
    * continuous span `[min, max]` (floating/decimal), index picked by
    * `distribution`. Ref: core/engine/columns/numeric.py:88-213. */
  final case class Range(
      min: BigDecimal,
      max: BigDecimal,
      step: Option[BigDecimal] = None,
      distribution: Distribution = Distribution.Uniform,
      continuous: Boolean = false) extends ColumnStrategy

  /** Pick from a literal list, optionally weighted (weights need not sum to
    * 1; they are normalized). Ref: core/engine/columns/string.py:24-61. */
  final case class Values(values: Seq[Any], weights: Seq[Double] = Nil,
      distribution: Distribution = Distribution.Uniform) extends ColumnStrategy

  /** `"ORD-{digit:4}-{alpha:3}"` style placeholder template.
    * Placeholders: {seq} {uuid} {digit:N} {alpha:N} {hex:N}.
    * Ref: core/engine/columns/string.py:70-246. */
  final case class Pattern(pattern: String) extends ColumnStrategy

  /** Legacy char-class template: `a A x X d D k K`, escapes
    * `\n \N \w \W \v \v0-\v9 \V`, `|` alternation.
    * Ref: dbldatagen/text_generators.py:413-960 (token table :431-501). */
  final case class Template(template: String, escapeSpecialChars: Boolean = false,
      wordList: Seq[String] = Nil,
      /** Column whose value feeds `\v`/`\V` (and, when it is an array column,
        * `\v0`..`\v9`). Defaults to the row id, matching the reference's
        * default base column (text_generators.py:431-501). */
      baseColumn: Option[String] = None) extends ColumnStrategy

  /** Deterministic UUID-shaped string from two 64-bit hashes (not RFC-4122).
    * Ref: core/engine/columns/uuid.py:15-58. */
  case object Uuid extends ColumnStrategy

  /** Timestamp in [begin, end] on an interval lattice (seconds granularity).
    * Ref: core/engine/columns/temporal.py:19-140. */
  final case class Timestamp(begin: java.time.Instant, end: java.time.Instant,
      intervalSeconds: Long = 1L,
      distribution: Distribution = Distribution.Uniform) extends ColumnStrategy

  /** Date in [begin, end] stepping `intervalDays`. */
  final case class DateRange(begin: java.time.LocalDate, end: java.time.LocalDate,
      intervalDays: Int = 1,
      distribution: Distribution = Distribution.Uniform) extends ColumnStrategy

  /** Constant literal. */
  final case class Constant(value: Any) extends ColumnStrategy

  /** Arbitrary Spark SQL expression; may reference earlier columns. */
  final case class Expression(sql: String) extends ColumnStrategy

  /** Foreign key into `table`.`column`; the parent key is *reconstructed*
    * from the parent PK strategy — referential integrity by construction,
    * zero joins, zero shuffles. Ref: core/engine/fk.py:21-136. */
  final case class ForeignKey(table: String, column: String,
      distribution: Distribution = Distribution.Uniform) extends ColumnStrategy

  /** Struct of named sub-strategies (recursive). `asJson` emits the struct
    * serialized with to_json (ref: data_generator.py:1223). */
  final case class Struct(fields: Seq[(String, ColumnSpec)], asJson: Boolean = false) extends ColumnStrategy

  /** Array of `element` values with length in [minLength, maxLength]. */
  final case class ArrayOf(element: ColumnSpec, minLength: Int, maxLength: Int) extends ColumnStrategy

  /** Pick from a pre-built pool of realistic fake values (names, emails,
    * cities, ...) — offline wordlist analog of the reference's Faker pool
    * (core/engine/columns/faker_pool.py:18-131), but implemented as an
    * array-literal + element_at expression: no UDF, fully codegen'd. */
  final case class Faker(provider: String, poolSize: Int = 10000,
      locale: String = "en") extends ColumnStrategy

  /** Ipsum-lorem paragraphs/sentences/words text.
    * Ref: dbldatagen/text_generators.py:996-1257. */
  final case class ILText(paragraphs: (Int, Int) = (1, 1), sentences: (Int, Int) = (2, 4),
      words: (Int, Int) = (3, 8)) extends ColumnStrategy

  /** Escape hatch: arbitrary Scala function of the cell seed (UDF surface,
    * analog of PyfuncText plugins — text_generator_plugins.py:45-180). */
  final case class Plugin(fn: Long => String) extends ColumnStrategy
}

/** Full specification for one column. */
final case class ColumnSpec(
    name: String,
    dataType: DataType,
    strategy: ColumnStrategy,
    percentNulls: Double = 0.0,
    /** `omit` columns are usable as intermediates but dropped from output.
      * Ref: column_generation_spec.py:1088-1095. */
    omit: Boolean = false,
    seedMode: SeedMode = SeedMode.RowId,
    /** n > 1 replicates the generator into name_0..name_{n-1} (numFeatures).
      * Ref: column_generation_spec.py:1606-1689. */
    numColumns: Int = 1,
    /** With numColumns > 1: emit ONE array column of the n values instead of
      * n scalar columns (reference structType="array" —
      * column_generation_spec.py:1606-1689). dataType is the element type. */
    asArray: Boolean = false,
    /** printf format applied to the generated value. */
    format: Option[String] = None,
    prefix: Option[String] = None,
    suffix: Option[String] = None,
    /** Exactly this many distinct values (clamps the lattice). */
    uniqueValues: Option[Long] = None,
    /** Random-looking but bijective value scatter (affine permutation). */
    scatter: Boolean = false,
    /** Separator placed between prefix/suffix and the value (reference makes
      * this configurable — column_generation_spec.py:1519-1534). */
    textSeparator: String = "_",
    /** Legacy `random=True` mode: the cell's seed row index is drawn from a
      * `rand()` stream (seeded per [[DataGenPlan.randomSeedMethod]]) instead
      * of the row id — values keep their strategy's distribution but are
      * decoupled from row identity, and are repeatable only for the Fixed/
      * HashFieldName seed methods under an unchanged partitioning. Takes
      * precedence over `seedMode`.
      * Ref: column_generation_spec.py:946-992. */
    random: Boolean = false)

object ColumnSpec {
  def apply(name: String, ddl: String, strategy: ColumnStrategy): ColumnSpec =
    ColumnSpec(name, DataType.fromDDL(ddl), strategy)
}

/** Primary key declaration: which column, so FK children can reconstruct. */
final case class PrimaryKey(column: String)

/** Row-level constraints applied after generation.
  * Ref: dbldatagen constraints package (SURVEY §2.6). */
sealed trait Constraint { def supportsStreaming: Boolean = true }
object Constraint {
  final case class SqlExpr(sql: String) extends Constraint
  /** a < b < c pairwise over the column list. */
  final case class ChainedRelation(columns: Seq[String], relation: String = "<") extends Constraint
  final case class LiteralRange(columns: Seq[String], low: Any, high: Any, strict: Boolean = false) extends Constraint
  final case class LiteralRelation(columns: Seq[String], relation: String, value: Any) extends Constraint
  /** Each column between two *other* columns. */
  final case class RangedValues(columns: Seq[String], lowColumn: String, highColumn: String,
      strict: Boolean = false) extends Constraint
  final case class PositiveValues(columns: Seq[String], strict: Boolean = false) extends Constraint
  final case class NegativeValues(columns: Seq[String], strict: Boolean = false) extends Constraint
  final case class UniqueCombinations(columns: Seq[String] = Nil) extends Constraint {
    override def supportsStreaming: Boolean = false
  }
}

/** One generated table. */
final case class TableSpec(
    name: String,
    rows: Long,
    columns: Seq[ColumnSpec],
    primaryKey: Option[PrimaryKey] = None,
    partitions: Option[Int] = None,
    constraints: Seq[Constraint] = Nil)

/** Multi-table generation plan with a global seed. */
final case class DataGenPlan(tables: Seq[TableSpec], seed: Long = 42L,
    /** Seeding discipline for `random = true` columns (reference defaults to
      * hash_fieldname when no explicit seed is given —
      * data_generator.py:172-198). */
    randomSeedMethod: RandomSeedMethod = RandomSeedMethod.HashFieldName)

/** Output sink configuration (ref: dbldatagen/config.py:13-38). */
final case class OutputDataset(
    location: String,
    format: String = "parquet",
    outputMode: String = "overwrite",
    options: Map[String, String] = Map.empty,
    triggerProcessingTime: Option[String] = None,
    /** Hive-style partition columns (directory pruning at read time). */
    partitionBy: Seq[String] = Nil,
    /** Bucket spec: co-locates join/agg keys at WRITE time so downstream
      * same-key joins between bucketed tables run with zero Exchange.
      * Bucketed writes go through the catalog (`saveAsTable`), so
      * `tableName` is required alongside. */
    bucketBy: Seq[String] = Nil,
    buckets: Int = 0,
    tableName: Option[String] = None)

final case class SpecError(message: String) extends RuntimeException(message)
