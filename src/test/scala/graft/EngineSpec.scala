package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Generator
import graft.plan.Planner
import graft.spec._
import graft.spec.ColumnStrategy._

object SparkTestSession {
  // SessionTuning so the whole suite runs under the engine defaults the
  // entry points use (incl. BareLocalFs — every index-lifecycle and
  // streaming test then exercises the bare local filesystem, r19).
  lazy val spark: SparkSession = SessionTuning.tune(SparkSession.builder()
    .master("local[4]")
    .appName("graft-test"))
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class EngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** FIXTURES.md §1: customers -> orders FK smoke. */
  def fkPlan: DataGenPlan = DataGenPlan(Seq(
    TableSpec("customers", rows = 200, primaryKey = Some(PrimaryKey("customer_id")), columns = Seq(
      ColumnSpec("customer_id", "bigint", Sequence(1, 1)),
      ColumnSpec("name", "string", Constant("test")))),
    TableSpec("orders", rows = 1000, primaryKey = Some(PrimaryKey("order_id")), columns = Seq(
      ColumnSpec("order_id", "bigint", Sequence(1, 1)),
      ColumnSpec("customer_id", "bigint", ForeignKey("customers", "customer_id", Distribution.Zipf(1.3))),
      ColumnSpec("amount", "bigint", Range(10, 500))))),
    seed = 42)

  test("fk plan: exact row counts, zero orphans, join covers all orders") {
    val dfs = Generator.generate(spark, fkPlan)
    val customers = dfs("customers").cache()
    val orders = dfs("orders").cache()
    assert(customers.count() === 200)
    assert(orders.count() === 1000)
    // referential integrity by construction: left-anti must be empty
    val orphans = orders.join(customers, Seq("customer_id"), "left_anti").count()
    assert(orphans === 0)
    val joined = orders.join(customers, Seq("customer_id"), "inner").count()
    assert(joined === 1000)
  }

  test("determinism: identical plans generate identical data") {
    val a = Generator.generate(spark, fkPlan)("orders").collect().toSeq
    val b = Generator.generate(spark, fkPlan)("orders").collect().toSeq
    assert(a === b)
  }

  test("partition independence: values identical under different partitioning") {
    val t = fkPlan.tables(1)
    val resolved = Planner.resolveOrThrow(fkPlan)
    val p1 = Generator.generateTable(spark, resolved, t.copy(partitions = Some(1)))
      .orderBy("order_id").collect().toSeq
    val p8 = Generator.generateTable(spark, resolved, t.copy(partitions = Some(8)))
      .orderBy("order_id").collect().toSeq
    assert(p1 === p8)
  }

  test("range lattice: all values in bounds and on step") {
    val plan = DataGenPlan(Seq(TableSpec("t", 5000, Seq(
      ColumnSpec("v", "int", Range(10, 500, step = Some(5)))))))
    val vals = Generator.generate(spark, plan)("t").select("v").collect().map(_.getInt(0))
    assert(vals.forall(v => v >= 10 && v <= 500 && (v - 10) % 5 == 0))
    assert(vals.distinct.length > 50) // spread over the lattice
  }

  test("continuous range: doubles within [min, max)") {
    val plan = DataGenPlan(Seq(TableSpec("t", 5000, Seq(
      ColumnSpec("v", "double", Range(1.5, 99.5, continuous = true))))))
    val vals = Generator.generate(spark, plan)("t").select("v").collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= 1.5 && v <= 99.5))
    assert(vals.distinct.length > 4000) // continuous, not lattice
  }

  test("sequence PK: exact, unique, monotone") {
    val plan = DataGenPlan(Seq(TableSpec("t", 1000, Seq(
      ColumnSpec("pk", "bigint", Sequence(100, 3))))))
    val vals = Generator.generate(spark, plan)("t").select("pk").collect().map(_.getLong(0)).sorted
    assert(vals.head === 100 && vals.last === 100 + 999 * 3)
    assert(vals.distinct.length === 1000)
  }

  test("values with weights: empirical distribution within 10% at 3000x rows") {
    // contract per reference function_builder.py:59-63
    val weights = Seq(0.5, 0.3, 0.15, 0.05)
    val plan = DataGenPlan(Seq(TableSpec("t", 12000, Seq(
      ColumnSpec("tier", "string", Values(Seq("bronze", "silver", "gold", "platinum"), weights))))))
    val counts = Generator.generate(spark, plan)("t").groupBy("tier").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    Seq("bronze" -> 0.5, "silver" -> 0.3, "gold" -> 0.15, "platinum" -> 0.05).foreach {
      case (v, w) =>
        val got = counts.getOrElse(v, 0L) / total
        assert(math.abs(got - w) < 0.1 * math.max(w, 0.02) + 0.02, s"$v: got $got want ~$w")
    }
  }

  test("percentNulls: fraction of nulls within tolerance") {
    val plan = DataGenPlan(Seq(TableSpec("t", 20000, Seq(
      ColumnSpec("v", "int", Range(1, 100)).copy(percentNulls = 0.25)))))
    val df = Generator.generate(spark, plan)("t")
    val nulls = df.where(col("v").isNull).count().toDouble / 20000
    assert(math.abs(nulls - 0.25) < 0.02, s"null fraction $nulls")
  }

  test("uuid: shape and uniqueness") {
    val plan = DataGenPlan(Seq(TableSpec("t", 5000, Seq(ColumnSpec("u", "string", Uuid)))))
    val vals = Generator.generate(spark, plan)("t").select("u").collect().map(_.getString(0))
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    assert(vals.forall(v => re.findFirstIn(v).isDefined))
    assert(vals.distinct.length === 5000)
  }

  test("pattern: literal + digit + alpha widths and determinism") {
    val plan = DataGenPlan(Seq(TableSpec("t", 2000, Seq(
      ColumnSpec("code", "string", Pattern("ORD-{digit:4}-{alpha:3}-{hex:2}"))))))
    val vals = Generator.generate(spark, plan)("t").select("code").collect().map(_.getString(0))
    val re = "^ORD-[0-9]{4}-[A-Z]{3}-[0-9a-f]{2}$".r
    assert(vals.forall(v => re.findFirstIn(v).isDefined), s"bad: ${vals.find(v => re.findFirstIn(v).isEmpty)}")
  }

  test("pattern {seq}: distinct per row, padded") {
    val plan = DataGenPlan(Seq(TableSpec("t", 500, Seq(
      ColumnSpec("c", "string", Pattern("CUST-{seq:6}"))))))
    val vals = Generator.generate(spark, plan)("t").select("c").collect().map(_.getString(0))
    assert(vals.distinct.length === 500)
    assert(vals.forall(_.matches("CUST-\\d{6}")))
    assert(vals.contains("CUST-000001"))
  }

  test("timestamp range: within bounds on the interval lattice") {
    val begin = java.time.Instant.parse("2020-01-01T01:00:00Z")
    val end = java.time.Instant.parse("2020-12-31T23:59:00Z")
    val plan = DataGenPlan(Seq(TableSpec("t", 3000, Seq(
      ColumnSpec("ts", "timestamp", Timestamp(begin, end, intervalSeconds = 60))))))
    val vals = Generator.generate(spark, plan)("t").select(unix_timestamp(col("ts")))
      .collect().map(_.getLong(0))
    assert(vals.forall(v => v >= begin.getEpochSecond && v <= end.getEpochSecond))
    assert(vals.forall(v => (v - begin.getEpochSecond) % 60 == 0))
  }

  test("date range: within bounds") {
    val plan = DataGenPlan(Seq(TableSpec("t", 1000, Seq(
      ColumnSpec("d", "date", DateRange(java.time.LocalDate.parse("2000-01-01"),
        java.time.LocalDate.parse("2000-12-31")))))))
    val vals = Generator.generate(spark, plan)("t").select("d").collect().map(_.getDate(0).toString)
    assert(vals.forall(v => v >= "2000-01-01" && v <= "2000-12-31"))
  }

  test("expression columns resolve against earlier phases; omit drops intermediates") {
    val plan = DataGenPlan(Seq(TableSpec("t", 100, Seq(
      ColumnSpec("a", "int", Range(1, 10)),
      ColumnSpec("b", "int", Range(1, 10)).copy(omit = true),
      ColumnSpec("c", "int", Expression("a + b"))))))
    val df = Generator.generate(spark, plan)("t")
    assert(df.columns.toSeq === Seq("a", "c"))
    assert(df.where(col("c") < col("a")).count() === 0) // c = a + b >= a (b >= 1)
  }

  test("struct and array columns") {
    val plan = DataGenPlan(Seq(TableSpec("t", 200, Seq(
      ColumnSpec("s", "struct<x:int,y:string>", Struct(Seq(
        "x" -> ColumnSpec("x", "int", Range(1, 5)),
        "y" -> ColumnSpec("y", "string", Values(Seq("a", "b")))))),
      ColumnSpec("arr", "array<int>", ArrayOf(ColumnSpec("e", "int", Range(0, 9)), 2, 5))))))
    val df = Generator.generate(spark, plan)("t").cache()
    assert(df.select("s.x").collect().map(_.getInt(0)).forall(x => x >= 1 && x <= 5))
    val sizes = df.select(size(col("arr"))).collect().map(_.getInt(0))
    assert(sizes.forall(s => s >= 2 && s <= 5))
    assert(sizes.distinct.length > 1)
  }

  test("unique values clamp + scatter bijection keeps exact cardinality") {
    val plan = DataGenPlan(Seq(TableSpec("t", 10000, Seq(
      ColumnSpec("v", "bigint", Range(0, 1000000)).copy(uniqueValues = Some(100), scatter = true)))))
    val vals = Generator.generate(spark, plan)("t").select("v").distinct().count()
    assert(vals === 100)
  }

  test("constraints: chained relation + positive + unique combinations") {
    val plan = DataGenPlan(Seq(TableSpec("t", 2000, Seq(
      ColumnSpec("lo", "int", Range(0, 50)),
      ColumnSpec("hi", "int", Range(0, 50))),
      constraints = Seq(Constraint.ChainedRelation(Seq("lo", "hi")),
        Constraint.PositiveValues(Seq("lo"))))))
    val df = Generator.generate(spark, plan)("t")
    assert(df.where(col("lo") >= col("hi")).count() === 0)
    assert(df.count() > 0)
  }

  test("zipf skews towards low parent indexes") {
    val dfs = Generator.generate(spark, fkPlan)
    val top = dfs("orders").groupBy("customer_id").count().orderBy(desc("count"))
      .limit(5).collect().map(_.getLong(0))
    // heaviest customers should be among the lowest ids under zipf
    assert(top.forall(_ <= 20), s"zipf heavy hitters: ${top.mkString(",")}")
  }

  test("validation catches bad specs with full error list") {
    val bad = DataGenPlan(Seq(
      TableSpec("t", 0, Seq(
        ColumnSpec("v", "int", Range(10, 5)),
        ColumnSpec("v", "int", Range(1, 2)),
        ColumnSpec("fk", "int", ForeignKey("missing", "x"))))))
    Planner.resolve(bad) match {
      case Left(errs) =>
        val msg = errs.map(_.message).mkString("\n")
        assert(msg.contains("rows must be > 0"))
        assert(msg.contains("duplicate column"))
        assert(msg.contains("max < min"))
        assert(msg.contains("unknown table"))
      case Right(_) => fail("expected validation errors")
    }
  }
}
