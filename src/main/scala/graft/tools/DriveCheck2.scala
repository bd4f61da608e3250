package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analyzer.DataAnalyzer
import graft.api.DataGenerator
import graft.datasets.Datasets
import graft.engine.Generator
import graft.io.{PlanJson, Scripting, Writer}
import graft.spec._

/** Dev drive harness #2: serialization, fluent API, writer, analyzer,
  * datasets, scripting. Run: `sbt "runMain graft.tools.DriveCheck2"`. */
object DriveCheck2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. Load the reference star-schema JSON fixture, generate, check FK
    //    integrity via left-anti joins (FIXTURES.md §2 contract).
    val star = PlanJson.loadFile("/root/reference/tests/core/fixtures/star_schema.json")
    val tables = Generator.generate(spark, star)
    println("CHECK10 star tables: " + tables.map { case (n, df) => s"$n=${df.count()}" }.mkString(" "))
    def orphans(child: String, childCol: String, parent: String, parentCol: String): Long =
      tables(child).join(tables(parent),
        tables(child)(childCol) === tables(parent)(parentCol), "left_anti").count()
    val orphanCounts = Seq(
      orphans("customers", "region_id", "regions", "region_id"),
      orphans("orders", "customer_id", "customers", "customer_id"),
      orphans("order_items", "order_id", "orders", "order_id"),
      orphans("order_items", "product_id", "products", "product_id"),
      tables("reviews").where(col("customer_id").isNotNull)
        .join(tables("customers"), Seq("customer_id"), "left_anti").count())
    println("CHECK10b star fk orphans (expect all 0): " + orphanCounts.mkString(","))
    val nullFrac = tables("reviews").agg(
      (sum(when(col("customer_id").isNull, 1).otherwise(0)).cast("double") / count(lit(1)))).collect().head.getDouble(0)
    println(f"CHECK10c reviews null fraction (expect ~0.2): $nullFrac%.3f")

    // 2. save -> load -> equality on a strategy-rich plan.
    val rich = DataGenPlan(Seq(TableSpec("rich", 100, Seq(
      ColumnSpec("pk", "bigint", ColumnStrategy.Sequence(10, 2)),
      ColumnSpec("r", "double", ColumnStrategy.Range(0, 1, continuous = true,
        distribution = Distribution.Normal(Some(0.5), Some(0.1)))),
      ColumnSpec("v", "string", ColumnStrategy.Values(Seq("a", "b"), Seq(0.6, 0.4))),
      ColumnSpec("p", "string", ColumnStrategy.Pattern("X-{digit:3}")),
      ColumnSpec("t", "string", ColumnStrategy.Template("""\w-dd""")),
      ColumnSpec("u", "string", ColumnStrategy.Uuid),
      ColumnSpec("ts", "timestamp", ColumnStrategy.Timestamp(
        java.time.Instant.parse("2024-01-01T00:00:00Z"), java.time.Instant.parse("2024-06-30T00:00:00Z"), 60)),
      ColumnSpec("d", "date", ColumnStrategy.DateRange(
        java.time.LocalDate.parse("2024-01-01"), java.time.LocalDate.parse("2024-12-31"))),
      ColumnSpec("c", "int", ColumnStrategy.Constant(7)),
      ColumnSpec("e", "bigint", ColumnStrategy.Expression("pk * 2")),
      ColumnSpec("f", "string", ColumnStrategy.Faker("email")),
      ColumnSpec("il", "string", ColumnStrategy.ILText()),
      ColumnSpec("st", "string", ColumnStrategy.Struct(Seq(
        "a" -> ColumnSpec("a", "int", ColumnStrategy.Range(1, 5, Some(1))),
        "b" -> ColumnSpec("b", "string", ColumnStrategy.Values(Seq("x", "y")))), asJson = true)),
      ColumnSpec("ar", "array<int>", ColumnStrategy.ArrayOf(
        ColumnSpec("e", "int", ColumnStrategy.Range(0, 9, Some(1))), 1, 4))),
      primaryKey = Some(PrimaryKey("pk")),
      constraints = Seq(Constraint.SqlExpr("pk > 0"),
        Constraint.LiteralRange(Seq("c"), 0, 10)))), seed = 7L)
    val roundTripped = PlanJson.loadJson(PlanJson.saveJson(rich))
    println("CHECK11 json roundtrip equal: " + (roundTripped == rich))
    val yamlTripped = PlanJson.loadYaml(PlanJson.saveYaml(rich))
    println("CHECK11b yaml roundtrip equal: " + (yamlTripped == rich))

    // 3. Reference plan.yml loads and generates.
    val yplan = PlanJson.loadFile("/root/reference/tests/core/fixtures/plan.yml")
    val ytables = Generator.generate(spark, yplan)
    println("CHECK12 plan.yml tables: " + ytables.map { case (n, df) => s"$n=${df.count()}" }.mkString(" "))

    // 4. Fluent API: the legacy IOT spec (FIXTURES.md section 3).
    val iot = DataGenerator(spark, "device_data_set", rows = 100000L, partitions = Some(8))
      .withColumn(ColumnSpec("internal_device_id", "bigint",
        ColumnStrategy.Range(0x1000000000000L, 0x1000000000000L + 99999L, Some(1)))
        .copy(uniqueValues = Some(100000L), omit = true))
      .withColumn(ColumnSpec("device_id", "string", ColumnStrategy.Expression("internal_device_id"))
        .copy(format = Some("0x%013x")))
      .withColumn(ColumnSpec("country", "string", ColumnStrategy.Values(
        Seq("US", "CA", "GB", "DE", "FR", "JP", "CN", "IN", "BR", "AU"),
        Seq(40, 10, 10, 8, 8, 8, 6, 4, 3, 3))).copy(seedMode = SeedMode.FromValue("internal_device_id")))
      .withColumn(ColumnSpec("manufacturer", "string", ColumnStrategy.Values(
        Seq("Delta", "Xyzzy", "Lakehouse", "Acme", "Embanks")))
        .copy(seedMode = SeedMode.FromValue("internal_device_id")))
      .withColumn(ColumnSpec("line", "string", ColumnStrategy.Values(
        Seq("ln1", "ln2", "ln3", "ln4", "ln5")))
        .copy(seedMode = SeedMode.FromColumns(Seq("manufacturer")), omit = true))
      .withColumn(ColumnSpec("model_ser", "int", ColumnStrategy.Range(1, 11, Some(1)))
        .copy(seedMode = SeedMode.FromColumns(Seq("device_id")), omit = true))
      .withExprColumn("model_line", "concat(line, '#', model_ser)", Some("string"))
      .withColumn("event_type", "string", ColumnStrategy.Values(
        Seq("activation", "deactivation", "plan change", "telecoms activity",
          "internet activity", "device error")))
      .withColumn("event_ts", "timestamp", ColumnStrategy.Timestamp(
        java.time.Instant.parse("2020-01-01T01:00:00Z"),
        java.time.Instant.parse("2020-12-31T23:59:00Z"), 60))
      .build()
    val iotStats = iot.agg(
      count(lit(1)).as("n"),
      countDistinct(col("device_id")).as("devices"),
      sum(when(col("device_id").rlike("^0x[0-9a-f]{13}$"), 0).otherwise(1)).as("bad_device_ids"),
      sum(when(col("model_line").rlike("^ln[1-5]#([1-9]|1[01])$"), 0).otherwise(1)).as("bad_model_lines"),
      sum(when(col("event_ts").between("2020-01-01 01:00:00", "2020-12-31 23:59:00"), 0).otherwise(1)).as("bad_ts"))
      .collect().head
    println("CHECK13 iot spec: " + iotStats)

    // 5. Writer: batch roundtrip + streaming rate sink.
    val tmp = java.nio.file.Files.createTempDirectory("graft_drive").toString
    val batchOut = OutputDataset(s"$tmp/batch", "parquet")
    Writer.writeBatch(tables("orders"), batchOut)
    println("CHECK14 batch write/read rows: " + spark.read.parquet(s"$tmp/batch").count())

    val streamTable = TableSpec("s", 1000, Seq(
      ColumnSpec("k", "bigint", ColumnStrategy.Sequence()),
      ColumnSpec("v", "string", ColumnStrategy.Values(Seq("a", "b", "c")))))
    val resolved = graft.plan.Planner.resolveOrThrow(DataGenPlan(Seq(streamTable)))
    val sdf = Generator.generateStream(spark, resolved, streamTable, rowsPerSecond = 500)
    val q = Writer.writeStream(sdf, OutputDataset(s"$tmp/stream", "parquet", "append",
      Map("checkpointLocation" -> s"$tmp/ckpt"), Some("1 second")))
    Thread.sleep(5000); q.stop(); q.awaitTermination(10000)
    val streamed = spark.read.parquet(s"$tmp/stream")
    println("CHECK15 stream rows>0: " + (streamed.count() > 0) + " cols: " + streamed.columns.mkString(","))

    // 6. Analyzer summary vs direct aggregation on the driver's lineitem.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val summary = DataAnalyzer.summarizeToDF(li, exact = true)
    summary.show(10, truncate = false)
    val cnt = summary.where(col("measure") === "count").collect().head.getString(1)
    println("CHECK16 analyzer count matches: " + (cnt.toLong == li.count()))
    println("CHECK16b script from schema:\n" + DataAnalyzer.scriptDataGeneratorFromSchema(li.schema).take(400))

    // 7. Datasets catalog: every provider generates.
    Datasets.registered.foreach { m =>
      val n = try Datasets(m.name).get(spark, rows = 2000).count() catch {
        case e: Throwable => -1L
      }
      println(s"CHECK17 dataset ${m.name}: rows=$n")
    }
    val salesTables = Datasets("multi_table/sales_order").getTables(spark, rows = 5000)
    println("CHECK17b sales_order tables: " +
      salesTables.map { case (n, df) => s"$n=${df.count()}" }.mkString(" "))

    // 8. Scripting.
    println("CHECK18 ddl:\n" + Scripting.scriptTable(tables("orders").schema, "orders"))
    println("CHECK18b merge:\n" + Scripting.scriptMerge(tables("orders").schema, "orders", "updates",
      joinExpr = "tgt.order_id = src.order_id", delExpr = Some("src.op = 'DELETE'")).take(300))

    spark.stop()
  }
}
