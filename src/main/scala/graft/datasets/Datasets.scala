package graft.datasets

import scala.collection.immutable.ListMap
import scala.language.dynamics
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.DataGenerator
import graft.engine.Generator
import graft.spec._

/** Catalog of named, reusable dataset specs — the analog of the reference's
  * `Datasets` registry + `DatasetProvider` classes (datasets_object.py:30,
  * datasets/dataset_provider.py:24-424, and the datasets package). Each provider is a
  * function (spark, rows, partitions, options) -> configured generator; the
  * specs below re-express the documented surfaces of the reference's eight
  * standard datasets in this engine's strategy ADT.
  */
object Datasets {

  final case class ProviderMeta(name: String, summary: String, tables: Seq[String],
      supportsStreaming: Boolean)

  type Options = Map[String, String]

  trait Provider {
    def meta: ProviderMeta
    /** Option keys this provider understands. `rows`/`partitions` are real
      * parameters, so the map holds only provider-specific knobs; any other
      * key fails fast (reference `allowed_options` decorator —
      * dataset_provider.py:251-289). */
    def allowedOptions: Set[String] = Set.empty
    /** Single-table entry: validate options, then build the primary table. */
    final def get(spark: SparkSession, rows: Long = 100000L, partitions: Option[Int] = None,
        options: Options = Map.empty): DataFrame = {
      checkOptions(options)
      build(spark, rows, partitions, options)
    }
    /** Multi-table entry; single-table providers return one entry. */
    final def getTables(spark: SparkSession, rows: Long = 100000L, partitions: Option[Int] = None,
        options: Options = Map.empty): ListMap[String, DataFrame] = {
      checkOptions(options)
      buildTables(spark, rows, partitions, options)
    }
    protected def build(spark: SparkSession, rows: Long, partitions: Option[Int],
        options: Options): DataFrame
    protected def buildTables(spark: SparkSession, rows: Long, partitions: Option[Int],
        options: Options): ListMap[String, DataFrame] =
      ListMap(meta.tables.head -> build(spark, rows, partitions, options))
    private def checkOptions(options: Options): Unit = {
      val bad = options.keySet.diff(allowedOptions)
      if (bad.nonEmpty) throw SpecError(
        s"dataset ${meta.name}: unsupported options [${bad.toSeq.sorted.mkString(", ")}]; " +
          (if (allowedOptions.isEmpty) "this provider takes no options"
           else s"allowed: ${allowedOptions.toSeq.sorted.mkString(", ")}"))
    }
  }

  private var reg: ListMap[String, Provider] = ListMap.empty
  private def register(p: Provider): Unit = { reg = reg + (p.meta.name -> p) }

  def registered: Seq[ProviderMeta] = reg.values.map(_.meta).toSeq
  def apply(name: String): Provider =
    reg.getOrElse(name, throw SpecError(
      s"unknown dataset '$name'; registered: ${reg.keys.mkString(", ")}"))

  // -------------------------------------------------------- navigator sugar
  // (reference `Datasets(spark, name).get(...)` — datasets_object.py:345-489)

  /** One-call fetch of a provider's primary table. */
  def get(spark: SparkSession, name: String, rows: Long = 100000L,
      partitions: Option[Int] = None, options: Options = Map.empty): DataFrame =
    apply(name).get(spark, rows, partitions, options)

  /** One-call fetch of all of a provider's tables. */
  def getTables(spark: SparkSession, name: String, rows: Long = 100000L,
      partitions: Option[Int] = None, options: Options = Map.empty): ListMap[String, DataFrame] =
    apply(name).getTables(spark, rows, partitions, options)

  /** Human-readable catalog entry: summary, tables, streaming, options. */
  def describe(name: String): String = {
    val p = apply(name)
    val opts = if (p.allowedOptions.isEmpty) "none" else p.allowedOptions.toSeq.sorted.mkString(", ")
    s"${p.meta.name}: ${p.meta.summary}\n  tables: ${p.meta.tables.mkString(", ")}\n" +
      s"  streaming: ${p.meta.supportsStreaming}\n  options: $opts"
  }

  def list: Seq[String] = reg.keys.toSeq

  /** Dotted navigation over the catalog — the reference's NavigatorNode
    * sugar (datasets_object.py:345-489, `X.grouping.dataset.table`)
    * re-expressed with `scala.Dynamic`:
    * {{{
    *   Datasets.navigator(spark).basic.user.get(rows = 1000)
    *   Datasets.navigator(spark).multi_table.sales_order.orders.get()
    * }}}
    * Segments accumulate lazily; `get` resolves the longest registered
    * provider prefix (segments joined with '/'), with at most one trailing
    * segment naming a table of that provider. Unknown paths fail with the
    * full path and the registered names, like the reference. */
  def navigator(spark: SparkSession): Navigator = Navigator(spark, Vector.empty)

  final case class Navigator(spark: SparkSession, segments: Vector[String])
      extends scala.Dynamic {
    def selectDynamic(segment: String): Navigator =
      copy(segments = segments :+ segment)

    /** Resolve the accumulated path and build: the provider's primary
      * table, or the named table for a `provider.table` path. */
    def get(rows: Long = 100000L, partitions: Option[Int] = None,
        options: Options = Map.empty): DataFrame = {
      val hit = segments.indices.reverse.map { i =>
        (segments.take(i + 1).mkString("/"), segments.drop(i + 1))
      }.collectFirst {
        case (name, rest) if reg.contains(name) && rest.size <= 1 =>
          (reg(name), rest.headOption)
      }
      hit match {
        case Some((p, None)) => p.get(spark, rows, partitions, options)
        case Some((p, Some(t))) =>
          val tabs = p.getTables(spark, rows, partitions, options)
          tabs.getOrElse(t, throw SpecError(
            s"provider '${p.meta.name}' has no table '$t'; tables: " +
              tabs.keys.mkString(", ")))
        case None => throw SpecError(
          s"could not find registered provider for path: ${segments.mkString("/")}" +
            s"; registered: ${reg.keys.mkString(", ")}")
      }
    }
  }

  /** Auto partition heuristic (ref: dataset_provider.py:291). */
  def autoPartitions(rows: Long, columns: Int): Int =
    math.max(4, math.min(96, (rows * columns / 5000000L).toInt))

  private def base(spark: SparkSession, name: String, rows: Long, partitions: Option[Int],
      nCols: Int): DataGenerator =
    DataGenerator(spark, name, rows = rows,
      partitions = Some(partitions.getOrElse(autoPartitions(rows, nCols))))

  // ------------------------------------------------------------ basic/user

  register(new Provider {
    val meta = ProviderMeta("basic/user", "Basic user dataset (customer ids, names, emails, ip addresses, phones)",
      Seq("primary"), supportsStreaming = true)
    override val allowedOptions = Set("dedupe", "random")
    protected def build(spark: SparkSession, rows: Long, partitions: Option[Int], options: Options): DataFrame = {
      val dedupe = options.get("dedupe").exists(_.toBoolean)
      // random=true flips the non-key columns to the legacy rand()-stream
      // mode (reference basic/user's `random` option).
      val g = base(spark, "user", rows, partitions, 5)
        .withColumn("customer_id", "bigint", ColumnStrategy.Sequence(1000000L))
        .withDefaultRandom(options.get("random").exists(_.toBoolean))
        .withColumn("name", "string", ColumnStrategy.Template("""\w \w|\w \w \w"""))
        .withColumn("email", "string", ColumnStrategy.Template("""\w.\w@\w.com|\w@\w.co.u\k"""))
        .withColumn("ip_addr", "string", ColumnStrategy.Template("""\n.\n.\n.\n"""))
        .withColumn("phone", "string", ColumnStrategy.Template("""(ddd)-ddd-dddd|1(ddd) ddd-dddd|ddd-ddd-dddd"""))
      (if (dedupe) g.withConstraint(Constraint.UniqueCombinations(Seq("customer_id"))) else g).build()
    }
  })

  // ------------------------------------------------------ basic/geometries

  register(new Provider {
    val meta = ProviderMeta("basic/geometries", "WKT geometries (points, lines, polygons)",
      Seq("primary"), supportsStreaming = true)
    override val allowedOptions = Set("geometryType", "maxVertices")
    protected def build(spark: SparkSession, rows: Long, partitions: Option[Int], options: Options): DataFrame = {
      val geomType = options.getOrElse("geometryType", "point")
      val maxVertices = options.getOrElse("maxVertices", "1").toInt
      val lonLat = Seq(
        "lon" -> ColumnSpec("lon", "double", ColumnStrategy.Range(-180, 180, continuous = true)),
        "lat" -> ColumnSpec("lat", "double", ColumnStrategy.Range(-90, 90, continuous = true)))
      val g = base(spark, "geometries", rows, partitions, 2)
        .withColumn("location_id", "bigint", ColumnStrategy.Sequence(1L))
      val withGeom = geomType match {
        case "point" =>
          g.withColumn(ColumnSpec("lon", "double", ColumnStrategy.Range(-180, 180, continuous = true)).copy(omit = true))
            .withColumn(ColumnSpec("lat", "double", ColumnStrategy.Range(-90, 90, continuous = true)).copy(omit = true))
            .withExprColumn("wkt", "concat('POINT(', round(lon, 4), ' ', round(lat, 4), ')')")
        case "linestring" | "polygon" =>
          val n = math.max(2, maxVertices)
          val verts = (0 until n).flatMap { i => Seq(
            ColumnSpec(s"lon_$i", "double", ColumnStrategy.Range(-180, 180, continuous = true)).copy(omit = true),
            ColumnSpec(s"lat_$i", "double", ColumnStrategy.Range(-90, 90, continuous = true)).copy(omit = true))
          }
          val pairs = (0 until n).map(i => s"concat(round(lon_$i, 4), ' ', round(lat_$i, 4))")
          val inner = pairs.mkString(", ', ', ")
          val body = s"concat($inner)"
          val g2 = verts.foldLeft(g)(_ withColumn _)
          if (geomType == "linestring") g2.withExprColumn("wkt", s"concat('LINESTRING(', $body, ')')")
          // Close the ring for polygons by repeating vertex 0.
          else g2.withExprColumn("wkt",
            s"concat('POLYGON((', $body, ', ', concat(round(lon_0, 4), ' ', round(lat_0, 4)), '))')")
        case other => throw SpecError(s"basic/geometries: unknown geometryType '$other'")
      }
      withGeom.build()
    }
  })

  // ------------------------------------------------------ basic/telematics

  register(new Provider {
    val meta = ProviderMeta("basic/telematics", "Vehicle telematics (device pings: lat/lon/speed/heading)",
      Seq("primary"), supportsStreaming = true)
    override val allowedOptions = Set("numDevices")
    protected def build(spark: SparkSession, rows: Long, partitions: Option[Int], options: Options): DataFrame = {
      val numDevices = options.getOrElse("numDevices", "1000").toLong
      base(spark, "telematics", rows, partitions, 8)
        .withColumn(ColumnSpec("device_id", "bigint",
          ColumnStrategy.Range(1, numDevices, Some(1))).copy(uniqueValues = Some(numDevices)))
        .withColumn("ts", "timestamp", ColumnStrategy.Timestamp(
          java.time.Instant.parse("2024-01-01T00:00:00Z"), java.time.Instant.parse("2024-12-31T23:59:59Z")))
        .withColumn("lat", "double", ColumnStrategy.Range(-90, 90, continuous = true))
        .withColumn("lon", "double", ColumnStrategy.Range(-180, 180, continuous = true))
        .withColumn("speed_kmh", "double", ColumnStrategy.Range(0, 180, continuous = true,
          distribution = Distribution.Exponential(1.0)))
        .withColumn("heading", "int", ColumnStrategy.Range(0, 359, Some(1)))
        .withColumn("engine_on", "boolean", ColumnStrategy.Values(Seq(true, false), Seq(0.85, 0.15)))
        .build()
    }
  })

  // ---------------------------------------------------- basic/stock_ticker

  register(new Provider {
    val meta = ProviderMeta("basic/stock_ticker", "Daily stock ticker series (symbol, open/close/high/low/volume)",
      Seq("primary"), supportsStreaming = true)
    override val allowedOptions = Set("numSymbols", "startDate")
    protected def build(spark: SparkSession, rows: Long, partitions: Option[Int], options: Options): DataFrame = {
      val numSymbols = options.getOrElse("numSymbols", "100").toInt
      val start = java.time.LocalDate.parse(options.getOrElse("startDate", "2024-01-01"))
      base(spark, "stock_ticker", rows, partitions, 8)
        .withColumn(ColumnSpec("symbol_id", "int",
          ColumnStrategy.Expression(s"cast(__graft_id % $numSymbols as int)")).copy(omit = true))
        .withExprColumn("symbol",
          s"concat('S', lpad(cast(symbol_id as string), 4, '0'))", Some("string"))
        .withExprColumn("trade_date",
          s"date_add(date'$start', cast(__graft_id div $numSymbols as int))", Some("date"))
        .withColumn(ColumnSpec("base_price", "double",
          ColumnStrategy.Range(5, 500, continuous = true))
          .copy(seedMode = SeedMode.FromValue("symbol_id"), omit = true))
        .withColumn(ColumnSpec("drift", "double",
          ColumnStrategy.Range(-5, 5, continuous = true)).copy(omit = true))
        .withExprColumn("open", "round(base_price + drift, 2)", Some("double"))
        .withExprColumn("close", "round(base_price + drift * 1.1, 2)", Some("double"))
        .withExprColumn("high", "round(greatest(open, close) * 1.02, 2)", Some("double"))
        .withExprColumn("low", "round(least(open, close) * 0.98, 2)", Some("double"))
        .withColumn("volume", "bigint", ColumnStrategy.Range(1000, 10000000, Some(1),
          distribution = Distribution.LogNormal(0.0, 1.0)))
        .build()
    }
  })

  // ---------------------------------------------- basic/process_historian

  register(new Provider {
    val meta = ProviderMeta("basic/process_historian", "Industrial process historian sensor readings",
      Seq("primary"), supportsStreaming = true)
    override val allowedOptions = Set("numDevices", "numTags")
    protected def build(spark: SparkSession, rows: Long, partitions: Option[Int], options: Options): DataFrame = {
      val numDevices = options.getOrElse("numDevices", "10000").toLong
      val numTags = options.getOrElse("numTags", "10").toInt
      base(spark, "process_historian", rows, partitions, 8)
        .withColumn(ColumnSpec("device_id", "bigint",
          ColumnStrategy.Range(1, numDevices, Some(1))).copy(uniqueValues = Some(numDevices)))
        .withColumn("plant_id", "int", ColumnStrategy.Range(1, 25, Some(1)))
        .withColumn("tag_name", "string", ColumnStrategy.Pattern(s"TAG-{digit:3}"))
        .withColumn("ts", "timestamp", ColumnStrategy.Timestamp(
          java.time.Instant.parse("2024-01-01T00:00:00Z"), java.time.Instant.parse("2024-03-31T23:59:59Z")))
        .withColumn("value", "double", ColumnStrategy.Range(0, 100, continuous = true,
          distribution = Distribution.Normal(Some(50.0), Some(12.0))))
        .withColumn("quality", "string", ColumnStrategy.Values(
          Seq("GOOD", "UNCERTAIN", "BAD"), Seq(0.95, 0.04, 0.01)))
        .withColumn("units", "string", ColumnStrategy.Values(Seq("degC", "bar", "pct", "m3h")))
        .build()
    }
  })

  // ------------------------------------------------------ benchmark/groupby

  register(new Provider {
    val meta = ProviderMeta("benchmark/groupby", "H2O groupby benchmark dataset (id1-id6, v1-v3)",
      Seq("primary"), supportsStreaming = false)
    override val allowedOptions = Set("groups", "percentNulls")
    protected def build(spark: SparkSession, rows: Long, partitions: Option[Int], options: Options): DataFrame = {
      var groups = options.getOrElse("groups", "100").toLong
      if (rows < groups) groups = 1 + rows / 1000
      val percentNulls = options.get("percentNulls").map(_.toDouble).getOrElse(0.0)
      val perGroup = 1 + rows / groups
      base(spark, "groupby", rows, partitions, 12)
        .withColumn(ColumnSpec("base1", "int", ColumnStrategy.Range(1, groups, Some(1)))
          .copy(uniqueValues = Some(groups), omit = true))
        .withColumn(ColumnSpec("base2", "int", ColumnStrategy.Range(1, groups, Some(1)))
          .copy(uniqueValues = Some(groups), omit = true, scatter = true))
        .withColumn(ColumnSpec("base3", "int", ColumnStrategy.Range(1, perGroup, Some(1)))
          .copy(uniqueValues = Some(perGroup), omit = true))
        .withColumn(ColumnSpec("id1", "string", ColumnStrategy.Expression("base1"))
          .copy(format = Some("id%03d"), percentNulls = percentNulls))
        .withColumn(ColumnSpec("id2", "string", ColumnStrategy.Expression("base2"))
          .copy(format = Some("id%03d"), percentNulls = percentNulls))
        .withColumn(ColumnSpec("id3", "string", ColumnStrategy.Expression("base3"))
          .copy(format = Some("id%010d"), percentNulls = percentNulls))
        .withColumn(ColumnSpec("id4", "int", ColumnStrategy.Range(1, groups, Some(1)))
          .copy(percentNulls = percentNulls))
        .withColumn(ColumnSpec("id5", "int", ColumnStrategy.Range(1, groups, Some(1)))
          .copy(percentNulls = percentNulls))
        .withColumn(ColumnSpec("id6", "int", ColumnStrategy.Range(1, perGroup, Some(1)))
          .copy(percentNulls = percentNulls))
        .withColumn("v1", "int", ColumnStrategy.Range(1, 5, Some(1)))
        .withColumn("v2", "int", ColumnStrategy.Range(1, 15, Some(1)))
        .withColumn("v3", "double", ColumnStrategy.Range(0, 100, continuous = true))
        .build()
    }
  })

  // ------------------------------------------------- multi_table/sales_order

  register(new Provider {
    val meta = ProviderMeta("multi_table/sales_order",
      "Multi-table sales order schema (customers, carriers, catalog items, orders, order line items, invoices)",
      Seq("customers", "carriers", "catalog_items", "base_orders", "base_order_line_items",
        "base_order_shipments", "invoices"), supportsStreaming = false)
    override val allowedOptions = Set("numCustomers", "numCarriers", "numCatalogItems", "seed")

    private def plan(rows: Long, options: Options): DataGenPlan = {
      val nCustomers = options.getOrElse("numCustomers", "1000").toLong
      val nCarriers = options.getOrElse("numCarriers", "20").toLong
      val nItems = options.getOrElse("numCatalogItems", "500").toLong
      val nOrders = math.max(1L, rows / 5)
      val nLines = rows
      def seqPk(name: String) = ColumnSpec(name, "bigint", ColumnStrategy.Sequence(1L))
      DataGenPlan(Seq(
        TableSpec("customers", nCustomers, Seq(
          seqPk("customer_id"),
          ColumnSpec("customer_name", "string", ColumnStrategy.Faker("company")),
          ColumnSpec("email", "string", ColumnStrategy.Faker("email")),
          // FIXTURES.md §5 surface: SIC code, headcount, phone, terms, dates
          ColumnSpec("sic_code", "int", ColumnStrategy.Range(100, 9995, Some(1))),
          ColumnSpec("num_employees", "int", ColumnStrategy.Range(1, 10000, Some(1),
            distribution = Distribution.LogNormal(0.0, 1.2))),
          ColumnSpec("phone_number", "string", ColumnStrategy.Template("""ddd-ddd-dddd""")),
          ColumnSpec("payment_terms", "string", ColumnStrategy.Values(
            Seq("NET30", "NET60", "NET90", "PREPAID"), Seq(0.5, 0.25, 0.1, 0.15))),
          ColumnSpec("created_on", "date", ColumnStrategy.DateRange(
            java.time.LocalDate.parse("2000-01-01"), java.time.LocalDate.parse("2023-12-31"))),
          ColumnSpec("region", "string", ColumnStrategy.Values(
            Seq("NORTH", "SOUTH", "EAST", "WEST"), Seq(0.3, 0.2, 0.25, 0.25))),
          ColumnSpec("credit_limit", "double", ColumnStrategy.Range(1000, 100000, continuous = true))),
          primaryKey = Some(PrimaryKey("customer_id"))),
        TableSpec("carriers", nCarriers, Seq(
          seqPk("carrier_id"),
          ColumnSpec("carrier_name", "string", ColumnStrategy.Faker("company"))),
          primaryKey = Some(PrimaryKey("carrier_id"))),
        TableSpec("catalog_items", nItems, Seq(
          seqPk("item_id"),
          ColumnSpec("item_name", "string", ColumnStrategy.Template("""\w \w \w""")),
          // FIXTURES.md §5: decimal(8,2) 1.50..500.00
          ColumnSpec("unit_price", "decimal(8,2)",
            ColumnStrategy.Range(BigDecimal("1.50"), BigDecimal("500.00"), Some(BigDecimal("0.01"))))),
          primaryKey = Some(PrimaryKey("item_id"))),
        TableSpec("base_orders", nOrders, Seq(
          seqPk("order_id"),
          ColumnSpec("customer_id", "bigint", ColumnStrategy.ForeignKey("customers", "customer_id",
            Distribution.Zipf(1.3))),
          ColumnSpec("order_ts", "timestamp", ColumnStrategy.Timestamp(
            java.time.Instant.parse("2024-01-01T00:00:00Z"), java.time.Instant.parse("2024-12-31T23:59:59Z"))),
          ColumnSpec("status", "string", ColumnStrategy.Values(
            Seq("OPEN", "SHIPPED", "DELIVERED", "CANCELLED"), Seq(0.1, 0.2, 0.65, 0.05)))),
          primaryKey = Some(PrimaryKey("order_id"))),
        TableSpec("base_order_line_items", nLines, Seq(
          seqPk("line_item_id"),
          ColumnSpec("order_id", "bigint", ColumnStrategy.ForeignKey("base_orders", "order_id")),
          ColumnSpec("item_id", "bigint", ColumnStrategy.ForeignKey("catalog_items", "item_id",
            Distribution.Zipf(1.5))),
          ColumnSpec("quantity", "int", ColumnStrategy.Range(1, 10, Some(1))),
          ColumnSpec("unit_price", "double", ColumnStrategy.Range(1, 999.99, continuous = true))),
          primaryKey = Some(PrimaryKey("line_item_id"))),
        TableSpec("base_order_shipments", nOrders, Seq(
          seqPk("shipment_id"),
          ColumnSpec("order_id", "bigint", ColumnStrategy.ForeignKey("base_orders", "order_id")),
          ColumnSpec("carrier_id", "bigint", ColumnStrategy.ForeignKey("carriers", "carrier_id")),
          ColumnSpec("ship_days", "int", ColumnStrategy.Range(1, 14, Some(1),
            distribution = Distribution.Exponential(1.0)))),
          primaryKey = Some(PrimaryKey("shipment_id")))),
        seed = options.getOrElse("seed", "42").toLong)
    }

    protected def build(spark: SparkSession, rows: Long, partitions: Option[Int], options: Options): DataFrame =
      buildTables(spark, rows, partitions, options)("base_order_line_items")

    override protected def buildTables(spark: SparkSession, rows: Long, partitions: Option[Int],
        options: Options): ListMap[String, DataFrame] = {
      val generated = Generator.generate(spark, plan(rows, options))
      // Invoices are a JOIN product (order lines x orders), like the
      // reference's derived invoice table — the one place a shuffle is the
      // semantics. Orders is the small side: broadcast it.
      import org.apache.spark.sql.functions._
      val invoices = generated("base_order_line_items")
        .join(broadcast(generated("base_orders")), "order_id")
        .groupBy(col("order_id"), col("customer_id"))
        .agg(round(sum(col("quantity") * col("unit_price")), 2).as("invoice_amount"),
          count(lit(1)).as("line_count"))
      generated + ("invoices" -> invoices)
    }
  })

  // --------------------------------------------------- multi_table/telephony

  register(new Provider {
    val meta = ProviderMeta("multi_table/telephony",
      "Telephony schema (plans, customers, device events billing-style)",
      Seq("plans", "customers", "device_events"), supportsStreaming = false)
    override val allowedOptions = Set("numPlans", "numCustomers", "seed")

    private def plan(rows: Long, options: Options): DataGenPlan = {
      val nPlans = options.getOrElse("numPlans", "20").toLong
      val nCustomers = options.getOrElse("numCustomers", "5000").toLong
      DataGenPlan(Seq(
        TableSpec("plans", nPlans, Seq(
          ColumnSpec("plan_id", "bigint", ColumnStrategy.Sequence(1L)),
          ColumnSpec("plan_name", "string", ColumnStrategy.Pattern("PLAN-{alpha:4}")),
          ColumnSpec("cost_per_minute", "double", ColumnStrategy.Range(0.01, 0.5, continuous = true)),
          ColumnSpec("cost_per_message", "double", ColumnStrategy.Range(0.001, 0.1, continuous = true)),
          ColumnSpec("cost_per_mb", "double", ColumnStrategy.Range(0.01, 0.25, continuous = true))),
          primaryKey = Some(PrimaryKey("plan_id"))),
        TableSpec("customers", nCustomers, Seq(
          ColumnSpec("customer_id", "bigint", ColumnStrategy.Sequence(1000L)),
          ColumnSpec("customer_name", "string", ColumnStrategy.Faker("name")),
          ColumnSpec("phone_number", "string", ColumnStrategy.Template("""(ddd) ddd-dddd""")),
          ColumnSpec("plan_id", "bigint", ColumnStrategy.ForeignKey("plans", "plan_id")),
          ColumnSpec("active", "boolean", ColumnStrategy.Values(Seq(true, false), Seq(0.92, 0.08)))),
          primaryKey = Some(PrimaryKey("customer_id"))),
        TableSpec("device_events", rows, Seq(
          ColumnSpec("event_id", "bigint", ColumnStrategy.Sequence(1L)),
          ColumnSpec("customer_id", "bigint", ColumnStrategy.ForeignKey("customers", "customer_id",
            Distribution.Zipf(1.2))),
          ColumnSpec("event_type", "string", ColumnStrategy.Values(
            Seq("call", "sms", "data"), Seq(0.5, 0.3, 0.2))),
          ColumnSpec("ts", "timestamp", ColumnStrategy.Timestamp(
            java.time.Instant.parse("2024-06-01T00:00:00Z"), java.time.Instant.parse("2024-06-30T23:59:59Z"))),
          ColumnSpec("minutes", "double", ColumnStrategy.Range(0, 120, continuous = true,
            distribution = Distribution.Exponential(1.0))),
          ColumnSpec("mb_transferred", "double", ColumnStrategy.Range(0, 1024, continuous = true,
            distribution = Distribution.LogNormal(0.0, 1.5)))),
          primaryKey = Some(PrimaryKey("event_id")))),
        seed = options.getOrElse("seed", "42").toLong)
    }

    protected def build(spark: SparkSession, rows: Long, partitions: Option[Int], options: Options): DataFrame =
      buildTables(spark, rows, partitions, options)("device_events")

    override protected def buildTables(spark: SparkSession, rows: Long, partitions: Option[Int],
        options: Options): ListMap[String, DataFrame] =
      Generator.generate(spark, plan(rows, options))
  })
}
