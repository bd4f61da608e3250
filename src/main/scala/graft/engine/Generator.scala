package graft.engine

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import graft.columns.{BuildContext, ColumnCompiler, PkInfo}
import graft.plan.{Planner, ResolvedPlan}
import graft.spec._

/** Execution engine: plan -> DataFrame(s).
  *
  * The physical shape is deliberately trivial for Catalyst:
  * `Range -> Project[phases] -> Filter? -> Project` — a fully narrow,
  * shuffle-free, whole-stage-codegen pipeline. At 100 TB this is
  * embarrassingly parallel: every partition generates independently from
  * (seed, rowId), FKs are reconstructed arithmetically (no joins), and
  * repartitioning cannot change a single value.
  * Lifecycle per SURVEY.md §3 (reference: dbldatagen/core/api.py:20-61,
  * core/engine/generator.py:48-212, data_generator.py:1642-1746).
  */
object Generator {

  val IdColumn = "__graft_id"
  /** Reserved rate-source timestamp column under streaming builds
    * (ref: data_generator.py:47). */
  val StreamingTimestampColumn = "_source_timestamp"

  /** Generate every table of a plan, in FK dependency order. */
  def generate(spark: SparkSession, plan: DataGenPlan): ListMap[String, DataFrame] = {
    val resolved = Planner.resolveOrThrow(plan)
    resolved.orderedTables.foldLeft(ListMap.empty[String, DataFrame]) { (acc, t) =>
      acc + (t.name -> generateTable(spark, resolved, t))
    }
  }

  /** Generate a single table of a resolved plan (batch). */
  def generateTable(spark: SparkSession, resolved: ResolvedPlan, table: TableSpec): DataFrame = {
    val partitions = table.partitions.getOrElse(spark.sparkContext.defaultParallelism)
    val base = spark.range(0L, table.rows, 1L, partitions).toDF(IdColumn)
    assemble(spark, resolved, table, base, streaming = false)
  }

  /** Streaming variant: same column expressions over a rate source
    * (ref: data_generator.py:1348-1369). */
  def generateStream(spark: SparkSession, resolved: ResolvedPlan, table: TableSpec,
      rowsPerSecond: Long = 1000L, numPartitions: Option[Int] = None): DataFrame = {
    table.constraints.filterNot(_.supportsStreaming).foreach { c =>
      throw SpecError(s"constraint ${c.getClass.getSimpleName} does not support streaming builds")
    }
    val reader = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
    numPartitions.foreach(n => reader.option("numPartitions", n.toString))
    val base = reader.load()
      .withColumnRenamed("timestamp", StreamingTimestampColumn)
      .withColumnRenamed("value", IdColumn)
    assemble(spark, resolved, table, base, streaming = true)
  }

  /** Deterministic streaming build over Spark's `rate-micro-batch` source:
    * batch k carries seed values [k*rowsPerBatch, (k+1)*rowsPerBatch) with
    * timestamp startTimestamp + k*advanceMillisPerBatch — no wall clock
    * anywhere, so under `Trigger.AvailableNow` (exactly one batch) the row
    * set is a pure function of the options and every generated column is
    * fully oracle-able. The reference pins its streaming test counts the
    * same way (tests/test_streaming.py:116-172). Use [[generateStream]]
    * when wall-clock pacing is the point; use this for verification and
    * reproducible streaming pipelines. */
  def generateStreamMicroBatch(spark: SparkSession, resolved: ResolvedPlan, table: TableSpec,
      rowsPerBatch: Long = 1000L, startTimestampMs: Long = 0L,
      advanceMillisPerBatch: Long = 1000L, numPartitions: Option[Int] = None): DataFrame = {
    table.constraints.filterNot(_.supportsStreaming).foreach { c =>
      throw SpecError(s"constraint ${c.getClass.getSimpleName} does not support streaming builds")
    }
    val reader = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("startTimestamp", startTimestampMs.toString)
      .option("advanceMillisPerBatch", advanceMillisPerBatch.toString)
    numPartitions.foreach(n => reader.option("numPartitions", n.toString))
    val base = reader.load()
      .withColumnRenamed("timestamp", StreamingTimestampColumn)
      .withColumnRenamed("value", IdColumn)
    assemble(spark, resolved, table, base, streaming = true)
  }

  private def assemble(spark: SparkSession, resolved: ResolvedPlan, table: TableSpec,
      base: DataFrame, streaming: Boolean): DataFrame = {
    val ctx = BuildContext(resolved.plan.seed, table.name, table.rows, resolved.pkInfo)

    // numColumns > 1 expands name into name_0..n-1 (distinct seeds derive
    // from the distinct names); with asArray the n values collapse back into
    // ONE array column. Ref: column_generation_spec.py:1606-1689.
    val expanded: Seq[ColumnSpec] = table.columns.flatMap { c =>
      if (c.numColumns == 1 || c.asArray) Seq(c)
      else (0 until c.numColumns).map(i => c.copy(name = s"${c.name}_$i", numColumns = 1))
    }
    val expandedTable = table.copy(columns = expanded)

    val phases = Planner.columnPhases(expandedTable, sql => parseRefs(spark, sql))

    // One wide select per phase: short lineage, one Project node each, and
    // Catalyst's CollapseProject merges what it can.
    val built = phases.foldLeft(base) { (df, phase) =>
      val exprs = phase.map { c =>
        val idCol =
          // Legacy random mode: substitute a rand()-drawn row index for the
          // row id. Every strategy and distribution then works unchanged
          // (value = strategy(cellSeed(randomIndex))), but values decouple
          // from row identity — the reference's random=True semantics
          // (column_generation_spec.py:946-992) without a second value path.
          // Narrow and codegen'd; Spark seeds rand per (seed, partitionId).
          if (c.random) floor(randomStream(c.name, resolved.plan) * lit(math.max(1L, table.rows)))
            .cast("long")
          else c.seedMode match {
            case SeedMode.RowId => col(IdColumn)
            case SeedMode.FromColumns(cols) => xxhash64(cols.map(col): _*)
            case SeedMode.FromColumnValues(cols) =>
              xxhash64(graft.seed.Seeds.rawValuesArray(cols))
            case SeedMode.FromValue(other) => col(other).cast("long")
          }
        if (c.numColumns > 1 && c.asArray)
          array((0 until c.numColumns).map { i =>
            ColumnCompiler.compile(c.copy(name = s"${c.name}_$i", numColumns = 1, asArray = false), ctx, idCol)
          }: _*).as(c.name)
        else ColumnCompiler.compile(c, ctx, idCol)
      }
      df.select(col("*") +: exprs: _*)
    }

    // Filter constraints run BEFORE the final projection (they may reference
    // omitted intermediate columns); UniqueCombinations runs AFTER it, on the
    // declared output columns only — running dropDuplicates while the
    // always-unique __graft_id is still present would be a silent no-op
    // (ADVICE r1).
    val filtered = applyFilterConstraints(built, table.constraints)

    // Final projection: declared order, omit intermediates, drop the seed id.
    val outputCols = expanded.filterNot(_.omit).map(c => col(c.name))
    val passthrough = if (streaming) Seq(col(StreamingTimestampColumn)) else Nil
    val projected = filtered.select(passthrough ++ outputCols: _*)

    table.constraints.foldLeft(projected) {
      case (d, Constraint.UniqueCombinations(cols)) =>
        if (cols.isEmpty) d.dropDuplicates(expanded.filterNot(_.omit).map(_.name))
        else d.dropDuplicates(cols)
      case (d, _) => d
    }
  }

  /** Uniform [0,1) stream for a `random = true` column, seeded per the
    * plan's seed method (reference: rand(seed) for fixed,
    * rand(hash('name')) for hash_fieldname, bare rand() otherwise —
    * column_generation_spec.py:946-992). Fixed/HashFieldName are repeatable
    * per run: Spark derives the partition RNG from (seed, partitionId). */
  private def randomStream(columnName: String, plan: DataGenPlan): Column =
    plan.randomSeedMethod match {
      case RandomSeedMethod.Fixed => rand(plan.seed)
      case RandomSeedMethod.HashFieldName =>
        // Same construction as the reference's rand(hash('name')): the
        // column-name hash is foldable, so each random column seeds a
        // decorrelated but per-run-repeatable stream.
        expr(s"rand(hash('${columnName.replace("'", "''")}'))")
      case RandomSeedMethod.Arbitrary => rand()
    }

  /** Extract identifiers referenced by a SQL expression using Catalyst's
    * real parser (reference uses a regex heuristic —
    * core/engine/planner.py:475-546; the parser is strictly better). */
  def parseRefs(spark: SparkSession, sql: String): Set[String] = {
    try {
      val e = spark.sessionState.sqlParser.parseExpression(sql)
      e.collect { case a: UnresolvedAttribute => a.nameParts.head }.toSet
    } catch { case _: Exception => Set.empty }
  }

  /** Filter constraints AND-combined into one `where`; UniqueCombinations is
    * handled separately after the final projection
    * (ref: data_generator.py:1609-1640, constraints package). */
  def applyFilterConstraints(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val filters = constraints.flatMap(filterFor)
    filters.reduceOption(_ && _) match {
      case Some(f) => df.where(f)
      case None => df
    }
  }

  /** Apply any constraint list to an arbitrary DataFrame (public surface —
    * also used by the driver correctness queries over the test tables). */
  def applyConstraints(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val filtered = applyFilterConstraints(df, constraints)
    constraints.foldLeft(filtered) {
      case (d, Constraint.UniqueCombinations(cols)) =>
        if (cols.isEmpty) d.dropDuplicates() else d.dropDuplicates(cols)
      case (d, _) => d
    }
  }

  private def relate(rel: String)(l: Column, r: Column): Column = rel match {
    case "<" => l < r
    case "<=" => l <= r
    case ">" => l > r
    case ">=" => l >= r
    case "==" | "=" => l === r
    case "!=" | "<>" => l =!= r
    case other => throw SpecError(s"unknown relation '$other'")
  }

  private def filterFor(c: Constraint): Option[Column] = c match {
    case Constraint.SqlExpr(sql) => Some(expr(sql))
    case Constraint.ChainedRelation(cols, rel) =>
      require(cols.length >= 2, "chained relation needs >= 2 columns")
      Some(cols.sliding(2).map { case Seq(a, b) => relate(rel)(col(a), col(b)) }.reduce(_ && _))
    case Constraint.LiteralRange(cols, lo, hi, strict) =>
      Some(cols.map { cn =>
        if (strict) col(cn) > lit(lo) && col(cn) < lit(hi)
        else col(cn).between(lit(lo), lit(hi))
      }.reduce(_ && _))
    case Constraint.LiteralRelation(cols, rel, v) =>
      Some(cols.map(cn => relate(rel)(col(cn), lit(v))).reduce(_ && _))
    case Constraint.RangedValues(cols, loCol, hiCol, strict) =>
      Some(cols.map { cn =>
        if (strict) col(cn) > col(loCol) && col(cn) < col(hiCol)
        else col(cn).between(col(loCol), col(hiCol))
      }.reduce(_ && _))
    case Constraint.PositiveValues(cols, strict) =>
      Some(cols.map(cn => col(cn).isNotNull && (if (strict) col(cn) > 0 else col(cn) >= 0)).reduce(_ && _))
    case Constraint.NegativeValues(cols, strict) =>
      Some(cols.map(cn => col(cn).isNotNull && (if (strict) col(cn) < 0 else col(cn) <= 0)).reduce(_ && _))
    case _: Constraint.UniqueCombinations => None
  }
}
