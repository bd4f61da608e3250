package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, NullType, StructType}
import graft.engine.Generator
import graft.io.{PlanJson, Writer}
import graft.plan.Planner
import graft.spec._

/** Fluent single-table builder — the primary user surface, mirroring the
  * reference's `DataGenerator` API shape (dbldatagen/data_generator.py:
  * 766-871, 982-1090) over the declarative plan ADT. Immutable: every
  * `with*` returns a new builder; `build()` resolves and generates.
  *
  * {{{
  * val df = DataGenerator(spark, "sensors", rows = 1000000)
  *   .withColumn("device_id", "bigint", ColumnStrategy.Sequence())
  *   .withColumn("temp", "double", ColumnStrategy.Range(-20, 120, continuous = true))
  *   .withColumn("tag", "string", ColumnStrategy.Values(Seq("a", "b", "c")))
  *   .build()
  * }}}
  */
final case class DataGenerator(
    spark: SparkSession,
    name: String = "synthetic",
    rows: Long = 1000000L,
    partitions: Option[Int] = None,
    seed: Long = 42L,
    columns: Vector[ColumnSpec] = Vector.empty,
    primaryKey: Option[PrimaryKey] = None,
    constraints: Vector[Constraint] = Vector.empty,
    /** Companion tables FKs may reference (built first, in FK order). */
    otherTables: Vector[TableSpec] = Vector.empty,
    /** Seeding discipline for `random = true` columns (reference
      * `randomSeedMethod` — data_generator.py:172-198). */
    randomSeedMethod: RandomSeedMethod = RandomSeedMethod.HashFieldName,
    /** Default for columns declared without an explicit random flag
      * (reference's generator-level `random` option). */
    defaultRandom: Boolean = false) {

  // ------------------------------------------------------------ columns

  def withColumn(spec: ColumnSpec): DataGenerator = {
    require(!columns.exists(_.name == spec.name), s"column '${spec.name}' already defined")
    val effective = if (defaultRandom && !spec.random) spec.copy(random = true) else spec
    copy(columns = columns :+ effective)
  }

  def withColumn(name: String, ddl: String, strategy: ColumnStrategy): DataGenerator =
    withColumn(ColumnSpec(name, ddl, strategy))

  /** Column with the default generator: the row id cast to the type
    * (reference default: value = seed column). */
  def withColumn(name: String, ddl: String): DataGenerator =
    withColumn(ColumnSpec(name, ddl, ColumnStrategy.Sequence(0L, 1L)))

  /** SQL-expression column; type inferred unless `ddl` is given. */
  def withExprColumn(name: String, sql: String, ddl: Option[String] = None): DataGenerator =
    withColumn(ColumnSpec(name, ddl.map(DataType.fromDDL).getOrElse(NullType),
      ColumnStrategy.Expression(sql)))

  /** Import every field of a schema as an implicit column spec (reference
    * `withSchema` — data_generator.py:766-779). */
  def withSchema(schema: StructType): DataGenerator =
    schema.fields.foldLeft(this) { (g, f) =>
      g.withColumn(ColumnSpec(f.name, f.dataType, ColumnStrategy.Sequence(0L, 1L)))
    }

  /** Re-spec columns already declared (usually via withSchema) whose names
    * match `pattern` (regex) and/or whose type is in `matchTypes` (reference
    * `withColumnSpecs` — data_generator.py:804-871). */
  def withColumnSpecs(pattern: Option[String] = None, matchTypes: Seq[DataType] = Nil,
      strategy: ColumnStrategy, percentNulls: Option[Double] = None): DataGenerator = {
    val rx = pattern.map(_.r)
    copy(columns = columns.map { c =>
      val nameOk = rx.forall(_.pattern.matcher(c.name).matches)
      val typeOk = matchTypes.isEmpty || matchTypes.contains(c.dataType)
      if (nameOk && typeOk)
        c.copy(strategy = strategy, percentNulls = percentNulls.getOrElse(c.percentNulls))
      else c
    })
  }

  /** Replace the spec of one existing column (reference `withColumnSpec`). */
  def withColumnSpec(name: String, f: ColumnSpec => ColumnSpec): DataGenerator = {
    require(columns.exists(_.name == name), s"column '$name' not defined")
    copy(columns = columns.map(c => if (c.name == name) f(c) else c))
  }

  /** Struct column from (fieldName -> spec) pairs (reference
    * `withStructColumn` — data_generator.py:1118-1228). */
  def withStructColumn(name: String, fields: Seq[(String, ColumnSpec)],
      asJson: Boolean = false): DataGenerator =
    withColumn(ColumnSpec(name, NullType, ColumnStrategy.Struct(fields, asJson)))

  // ------------------------------------------------------------ table opts

  def withPrimaryKey(column: String): DataGenerator = copy(primaryKey = Some(PrimaryKey(column)))
  def withConstraint(c: Constraint): DataGenerator = copy(constraints = constraints :+ c)
  def withSqlConstraint(sql: String): DataGenerator = withConstraint(Constraint.SqlExpr(sql))
  def withRows(n: Long): DataGenerator = copy(rows = n)
  def withPartitions(n: Int): DataGenerator = copy(partitions = Some(n))
  def withRandomSeed(s: Long): DataGenerator = copy(seed = s)
  /** Seed method for `random = true` columns: Fixed (`rand(seed)`),
    * HashFieldName (`rand(hash('name'))`, default), Arbitrary (`rand()`). */
  def withRandomSeedMethod(m: RandomSeedMethod): DataGenerator = copy(randomSeedMethod = m)
  /** Make subsequently-declared columns random by default (reference's
    * generator-level `random=True` — data_generator.py:172-198). */
  def withDefaultRandom(on: Boolean = true): DataGenerator = copy(defaultRandom = on)

  /** Add a companion table that this table's FK columns may reference. */
  def withReferencedTable(t: TableSpec): DataGenerator = copy(otherTables = otherTables :+ t)

  // ------------------------------------------------------------ build

  def tableSpec: TableSpec = TableSpec(name, rows, columns, primaryKey, partitions, constraints)
  def plan: DataGenPlan = DataGenPlan(otherTables :+ tableSpec, seed, randomSeedMethod)

  /** Generate the table (companion tables are resolved but only this table
    * is returned; FK integrity is by construction, so parents need not be
    * materialized). */
  def build(): DataFrame = {
    val resolved = Planner.resolveOrThrow(plan)
    Generator.generateTable(spark, resolved, tableSpec)
  }

  /** Streaming build over a rate source (reference
    * `build(withStreaming=True)`). */
  def buildStream(rowsPerSecond: Long = 1000L): DataFrame = {
    val resolved = Planner.resolveOrThrow(plan)
    Generator.generateStream(spark, resolved, tableSpec, rowsPerSecond, partitions)
  }

  /** Deterministic streaming build (`rate-micro-batch` source): batch k is
    * seeds [k*rowsPerBatch, (k+1)*rowsPerBatch) at a parameterized
    * timestamp — reproducible row sets for tests and backfills (see
    * [[graft.engine.Generator.generateStreamMicroBatch]]). */
  def buildStreamMicroBatch(rowsPerBatch: Long = 1000L, startTimestampMs: Long = 0L,
      advanceMillisPerBatch: Long = 1000L): DataFrame = {
    val resolved = Planner.resolveOrThrow(plan)
    Generator.generateStreamMicroBatch(spark, resolved, tableSpec, rowsPerBatch,
      startTimestampMs, advanceMillisPerBatch, partitions)
  }

  /** Build and register as a temp view (reference view registration —
    * data_generator.py:1696-1705). */
  def buildAsView(viewName: String, global: Boolean = false): DataFrame = {
    val df = build()
    if (global) df.createOrReplaceGlobalTempView(viewName)
    else df.createOrReplaceTempView(viewName)
    df
  }

  /** Build and write per the output config (reference `saveAsDataset`).
    * Parquet writes get spec-informed encoding hints (zstd, per-column
    * dictionary-off for high-entropy generators — [[Writer
    * .parquetEncodingHints]]); explicit `out.options` win. */
  def saveAsDataset(out: OutputDataset): Unit = {
    val df = if (out.triggerProcessingTime.isDefined) buildStream() else build()
    val hinted =
      if (out.format == "parquet")
        out.copy(options = Writer.parquetEncodingHints(tableSpec) ++ out.options)
      else out
    Writer.saveAsDataset(df, hinted)
    ()
  }

  def toJson: String = PlanJson.saveJson(plan)

  /** Human-readable build plan: phases and per-column strategies. */
  def explain(): String = {
    val t = tableSpec
    val phases = Planner.columnPhases(t, sql => Generator.parseRefs(spark, sql))
    val sb = new StringBuilder(s"table ${t.name} (${t.rows} rows, " +
      s"${t.partitions.getOrElse(spark.sparkContext.defaultParallelism)} partitions)\n")
    phases.zipWithIndex.foreach { case (phase, i) =>
      sb.append(s"  phase $i:\n")
      phase.foreach(c => sb.append(s"    ${c.name}: ${c.strategy}\n"))
    }
    if (t.constraints.nonEmpty) sb.append(s"  constraints: ${t.constraints.mkString(", ")}\n")
    sb.toString
  }
}
