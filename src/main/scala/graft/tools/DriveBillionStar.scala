package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}
import graft.spec._

/** Billion-row MULTI-TABLE headline: the reference's star-schema scenario
  * (dimension + fact with a foreign key) at 1e9 child rows. The claim
  * under test is the FK design itself — the child's `customer_id` is
  * RECONSTRUCTED from the parent PK strategy (`core/engine/fk.py:21-136`
  * semantics re-expressed as a pure column expression), so generating a
  * fact table with referential integrity costs the same narrow
  * projection as a standalone table: zero joins, zero shuffles, and the
  * generation rate must hold against the single-table 1B headline
  * (`bench_1b.json`).
  *
  * Two proofs in one run, written to `bench_1b_star.json`:
  *   - noop-materialized 1e9-row child generation wall (min of retries,
  *     steal-marked, 10M-row warmup) with the 10M-row parent leg timed
  *     separately;
  *   - referential integrity on a deterministic ~1% sample of the child
  *     (order_id % 97): left-anti join against the FULL regenerated
  *     parent must return ZERO orphans.
  *
  * Run: `sbt "runMain graft.tools.DriveBillionStar"`; optionally
  * SPARK_GRAFT_1B_ROWS (child rows, default 1e9). */
object DriveBillionStar {
  def main(args: Array[String]): Unit = {
    val childRows = sys.env.getOrElse("SPARK_GRAFT_1B_ROWS", "1000000000").toLong
    val parentRows = 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def c(n: String, t: String, s: ColumnStrategy) = ColumnSpec(n, t, s)
    def star(children: Long, partitions: Int) = DataGenPlan(Seq(
      TableSpec("customers", parentRows, Seq(
        c("customer_id", "bigint", ColumnStrategy.Sequence(1000000L, 1)),
        c("segment", "string", ColumnStrategy.Values(
          Seq("consumer", "corporate", "home office"), Seq(0.5, 0.3, 0.2))),
        c("region_code", "int", ColumnStrategy.Range(1, 25, Some(1)))),
        primaryKey = Some(PrimaryKey("customer_id")),
        partitions = Some(partitions)),
      TableSpec("orders", children, Seq(
        c("order_id", "bigint", ColumnStrategy.Sequence()),
        c("customer_id", "bigint", ColumnStrategy.ForeignKey("customers", "customer_id")),
        c("order_status", "string", ColumnStrategy.Values(
          Seq("open", "shipped", "returned", "cancelled"),
          Seq(0.2, 0.6, 0.1, 0.1))),
        c("order_total", "double", ColumnStrategy.Range(5.0, 500.0, continuous = true)),
        c("order_ts", "timestamp", ColumnStrategy.Timestamp(
          java.time.Instant.parse("2024-01-01T00:00:00Z"),
          java.time.Instant.parse("2024-12-31T23:59:00Z"), 60))),
        primaryKey = Some(PrimaryKey("order_id")),
        partitions = Some(partitions))), 42L)

    def steal(): Long = try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
      finally src.close()
    } catch { case _: Throwable => -1L }

    def gen(children: Long): Map[String, DataFrame] =
      graft.engine.Generator.generate(spark, star(children, cpus * 3))

    // Warmup at 1% scale: compile + JIT both tables' generated classes.
    gen(10000000L).values.foreach(_.write.mode("overwrite").format("noop").save())

    def timed(label: String, rows: Long)(body: => Unit): (Double, Double) = {
      var best = Double.MaxValue
      var bestSteal = 0.0
      var tries = 0
      while (tries == 0 || (tries < 3 && bestSteal > 0.2 * best)) {
        val s0 = steal()
        val t0 = System.nanoTime()
        body
        val wall = (System.nanoTime() - t0) / 1e9
        val st = if (s0 < 0) 0.0 else (steal() - s0) / 100.0
        println(f"CHECK $label try=$tries wall=$wall%.1fs rows/s=${rows / wall / 1e6}%.1fM steal=$st%.1fs")
        if (wall < best) { best = wall; bestSteal = st }
        tries += 1
      }
      (best, bestSteal)
    }

    val plan = gen(childRows)
    val (parentWall, parentSteal) = timed("star-parent-10m", parentRows) {
      plan("customers").write.mode("overwrite").format("noop").save()
    }
    val (childWall, childSteal) = timed("star-child-1b", childRows) {
      plan("orders").write.mode("overwrite").format("noop").save()
    }

    // Referential integrity, sampled: ~1% of the 1e9 child rows left-anti
    // joined against the FULL parent key set. FK reconstruction means the
    // sample's keys were derived without ever seeing the parent frame —
    // zero orphans is the by-construction claim being spot-verified.
    val sample = plan("orders").where(col("order_id") % 97 === 0)
      .select("order_id", "customer_id")
    val sampleRows = sample.count()
    val orphans = sample
      .join(plan("customers").select("customer_id"), Seq("customer_id"), "left_anti")
      .count()
    println(s"CHECK star-orphans sample_rows=$sampleRows orphans=$orphans (want 0)")

    val json =
      f"""{"bench":"gen_star_1b","child_rows":$childRows,"parent_rows":$parentRows,"child_noop_sec":$childWall%.1f,"child_rows_per_sec":${childRows / childWall}%.0f,"parent_noop_sec":$parentWall%.1f,"sample_rows":$sampleRows,"orphans":$orphans,"child_steal_sec":$childSteal%.1f,"parent_steal_sec":$parentSteal%.1f,"cores":$cpus}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_1b_star.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
