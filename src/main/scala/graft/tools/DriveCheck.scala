package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spec._
import graft.engine.Generator
import graft.plan.Planner

/** Dev drive harness: exercises engine behavior end-to-end through the
  * public API and prints observable CHECK lines. Not part of the library
  * surface; run with `sbt "runMain graft.tools.DriveCheck"`. */
object DriveCheck {
  def main(args: Array[String]): Unit = {
    
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    
    // 1. Normal value-space units: Range(0,100) continuous, Normal(mean=50, std=10).
    //    Pre-fix this clamped everything to ~100 (ADVICE r1). Expect mean ~50.
    val t1 = TableSpec("t1", 20000, Seq(
      ColumnSpec("v", "double", ColumnStrategy.Range(0, 100, continuous = true,
        distribution = Distribution.Normal(Some(50.0), Some(10.0))))))
    val df1 = Generator.generate(spark, DataGenPlan(Seq(t1))).head._2
    println("CHECK1 normal-continuous: " + df1.agg(
      round(avg("v"), 1).as("mean"), round(stddev("v"), 1).as("std"),
      round(max("v"), 1).as("max")).collect().head)
    
    // 1b. Normal on an int lattice Range(0,100,step=1), mean=30 std=5 (value units).
    val t1b = TableSpec("t1b", 20000, Seq(
      ColumnSpec("v", "int", ColumnStrategy.Range(0, 100, Some(1),
        distribution = Distribution.Normal(Some(30.0), Some(5.0))))))
    val df1b = Generator.generate(spark, DataGenPlan(Seq(t1b))).head._2
    println("CHECK1b normal-lattice: " + df1b.agg(
      round(avg("v"), 1).as("mean"), min("v"), max("v")).collect().head)
    
    // 2. UniqueCombinations() with no cols: low-cardinality column, 1000 rows ->
    //    pre-fix returned 1000 rows (no-op); post-fix must return <= 5.
    val t2 = TableSpec("t2", 1000, Seq(
      ColumnSpec("c", "string", ColumnStrategy.Values(Seq("a", "b", "c", "d", "e")))),
      constraints = Seq(Constraint.UniqueCombinations()))
    val n2 = Generator.generate(spark, DataGenPlan(Seq(t2))).head._2.count()
    println(s"CHECK2 uniqueCombinations rows (expect 5): $n2")
    
    // 3. PK decoration guard: prefix on a PK must be rejected at resolve time.
    val t3 = DataGenPlan(Seq(TableSpec("p", 10, Seq(
      ColumnSpec("id", "bigint", ColumnStrategy.Sequence()).copy(prefix = Some("C"))),
      primaryKey = Some(PrimaryKey("id")))))
    println("CHECK3 pk-decoration: " + (Planner.resolve(t3) match {
      case Left(errs) => "REJECTED: " + errs.head.message
      case Right(_) => "ACCEPTED (BUG)"
    }))
    
    // 4a. Template \v0 without baseColumn -> SpecError at build, not AnalysisException.
    val t4a = TableSpec("t4a", 10, Seq(
      ColumnSpec("x", "string", ColumnStrategy.Template("""\v0-d"""))))
    val r4a = try { Generator.generate(spark, DataGenPlan(Seq(t4a))).head._2.collect(); "ACCEPTED (BUG)" }
      catch { case e: SpecError => "REJECTED: " + e.message.take(80)
              case e: Throwable => "WRONG ERROR: " + e.getClass.getSimpleName }
    println("CHECK4a template-v0-nobase: " + r4a)
    
    // 4b. Template \v with an array baseColumn: \v0/\v1 pick elements.
    val t4b = TableSpec("t4b", 5, Seq(
      ColumnSpec("arr", "array<string>", ColumnStrategy.ArrayOf(
        ColumnSpec("e", "string", ColumnStrategy.Values(Seq("x", "y", "z"))), 2, 2)).copy(omit = true),
      ColumnSpec("s", "string", ColumnStrategy.Template("""\v0_\v1""", baseColumn = Some("arr")))))
    val df4b = Generator.generate(spark, DataGenPlan(Seq(t4b))).head._2
    println("CHECK4b template-v0-base: " + df4b.collect().map(_.getString(0)).mkString(","))
    
    // 5. Faker pool size: requested 5000 -> pool length must be 5000 (pre-fix
    //    .distinct collapsed it); distinct values bounded by wordlist.
    val pool = graft.columns.FakerPools.pool("first_name", 5000, 42L)
    println(s"CHECK5 faker pool: size=${pool.size} distinct=${pool.distinct.size}")
    
    // 6. Pareto: heavy skew to low indexes over Values a..e.
    val t6 = TableSpec("t6", 10000, Seq(
      ColumnSpec("v", "string", ColumnStrategy.Values(Seq("a", "b", "c", "d", "e"),
        distribution = Distribution.Pareto(1.16)))))
    val df6 = Generator.generate(spark, DataGenPlan(Seq(t6))).head._2
    println("CHECK6 pareto counts: " + df6.groupBy("v").count().orderBy("v")
      .collect().map(r => r.getString(0) + "=" + r.getLong(1)).mkString(" "))
    
    // 7. Weighted + scatter rejected.
    val t7 = DataGenPlan(Seq(TableSpec("t7", 10, Seq(
      ColumnSpec("w", "string", ColumnStrategy.Values(Seq("a", "b"), Seq(0.7, 0.3)))
        .copy(scatter = true)))))
    println("CHECK7 weighted+scatter: " + (Planner.resolve(t7) match {
      case Left(errs) => "REJECTED: " + errs.head.message.take(80)
      case Right(_) => "ACCEPTED (BUG)"
    }))
    
    // 8. ArrayOf node budget: 1000 x complex pattern must be rejected.
    val t8 = TableSpec("t8", 10, Seq(
      ColumnSpec("big", "array<string>", ColumnStrategy.ArrayOf(
        ColumnSpec("e", "string", ColumnStrategy.Pattern("{alpha:64}")), 1, 1000))))
    val r8 = try { Generator.generate(spark, DataGenPlan(Seq(t8))).head._2.collect(); "ACCEPTED (BUG)" }
      catch { case e: SpecError => "REJECTED: " + e.message.take(90)
              case e: Throwable => "WRONG ERROR: " + e.getClass.getSimpleName }
    println("CHECK8 array-budget: " + r8)
    
    // 9. Pattern PK cardinality: 100-value pattern PK for 1000 rows rejected.
    val t9 = DataGenPlan(Seq(TableSpec("p9", 1000, Seq(
      ColumnSpec("id", "string", ColumnStrategy.Pattern("U-{digit:2}"))),
      primaryKey = Some(PrimaryKey("id")))))
    println("CHECK9 pattern-pk-cardinality: " + (Planner.resolve(t9) match {
      case Left(errs) => "REJECTED: " + errs.head.message.take(100)
      case Right(_) => "ACCEPTED (BUG)"
    }))
    
    spark.stop()

  }
}
