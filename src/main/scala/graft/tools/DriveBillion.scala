package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.spec._

/** One-shot billion-row headline proof — the reference's own published
  * claim (APIDOCS "build a billion rows in under 2 minutes", 10-col IOT
  * spec with weighted values, hash uniques, template phones, random
  * timestamps, on 96 cores) reproduced at its own scale on local[32].
  *
  * Two timed legs over the identical spec `Bench.iotSpec` uses at 10M:
  *   - noop: full generation + materialization, no sink cost — pure
  *     engine throughput;
  *   - parquet: generation + a real snappy parquet write (the analog of
  *     the reference's Delta write).
  *
  * Run: `sbt "runMain graft.tools.DriveBillion"` (optionally
  * SPARK_GRAFT_1B_ROWS / SPARK_GRAFT_1B_DIR). Writes `bench_1b.json` in
  * the cwd with wall seconds, rows/s, and the same steal/neighbor-CPU
  * markers the bench carries, then deletes the parquet output.
  */
object DriveBillion {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_1B_ROWS", "1000000000").toLong
    val dir = sys.env.getOrElse("SPARK_GRAFT_1B_DIR", "/tmp/graft_iot_1b")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Same JIT-limit cap as Bench: oversized whole-stage methods would
      // run interpreted (measured 24x on the 50M IOT build).
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def c(n: String, t: String, s: ColumnStrategy) = ColumnSpec(n, t, s)
    // The full 10-col IOT spec from the reference's APIDOCS walkthrough
    // (docs/source/APIDOCS.md:443-516), identical to Bench.iotSpec.
    def iot(r: Long, partitions: Int) = TableSpec("iot", r, Seq(
      c("internal_device_id", "bigint", ColumnStrategy.Sequence(0x100000000L, 1)),
      c("device_id", "string", ColumnStrategy.Sequence(0x100000000L, 1))
        .copy(format = Some("0x%013x")),
      c("country", "string", ColumnStrategy.Values(
        Seq("US", "UK", "DE", "FR", "JP", "CN", "IN", "BR"),
        Seq(0.3, 0.1, 0.1, 0.1, 0.1, 0.15, 0.1, 0.05))),
      c("manufacturer", "string", ColumnStrategy.Values(
        Seq("Delta corp", "Xyzzy Inc.", "Lakehouse Ltd", "Acme Corp", "Embanks Devices"))),
      c("line", "string", ColumnStrategy.Pattern("ln-{alpha:8}")),
      c("model_ser", "int", ColumnStrategy.Range(1, 11, Some(1))),
      c("event_type", "string", ColumnStrategy.Values(
        Seq("activation", "deactivation", "plan change", "telecoms activity",
          "internet activity", "device error"),
        Seq(0.1, 0.05, 0.05, 0.3, 0.4, 0.1))),
      c("phone_number", "string", ColumnStrategy.Template("""(ddd)-ddd-dddd""")),
      c("event_ts", "timestamp", ColumnStrategy.Timestamp(
        java.time.Instant.parse("2020-01-01T00:00:00Z"),
        java.time.Instant.parse("2020-12-31T23:59:00Z"), 60))),
      partitions = Some(partitions))

    def steal(): Long = try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
      finally src.close()
    } catch { case _: Throwable => -1L }

    def gen(r: Long): DataFrame = graft.engine.Generator.generate(spark,
      DataGenPlan(Seq(iot(r, cpus * 3)), 42L))("iot")

    // Warmup: compile + JIT every generated class at 1% scale.
    gen(10000000L).write.mode("overwrite").format("noop").save()

    // Same contamination retry as Bench.timedRetry: a run whose interval
    // steal exceeds 20% of wall re-measures (up to 2 retries), minimum
    // wall kept with its own markers — the host carries noisy neighbors
    // that have inflated identical runs up to 13x.
    def timed(label: String)(body: => Unit): (Double, Double) = {
      var best = Double.MaxValue
      var bestSteal = 0.0
      var tries = 0
      while (tries == 0 || (tries < 3 && bestSteal > 0.2 * best)) {
        val s0 = steal()
        val t0 = System.nanoTime()
        body
        val wall = (System.nanoTime() - t0) / 1e9
        val st = if (s0 < 0) 0.0 else (steal() - s0) / 100.0
        println(f"CHECK $label try=$tries wall=${wall}%.1fs rows/s=${rows / wall / 1e6}%.1fM steal=${st}%.1fs")
        if (wall < best) { best = wall; bestSteal = st }
        tries += 1
      }
      (best, bestSteal)
    }

    val (noopWall, noopSteal) = timed("iot-1b-noop") {
      gen(rows).write.mode("overwrite").format("noop").save()
    }
    // SPARK_GRAFT_1B_NOOP_ONLY=1 re-measures just the generation leg (the
    // parquet leg takes ~6 min/try at 1e9 and the shared host's quiet
    // windows are short); the artifact then keeps parquet fields at -1.
    if (sys.env.get("SPARK_GRAFT_1B_NOOP_ONLY").contains("1")) {
      val json =
        f"""{"bench":"gen_iot_1b_noop","rows":$rows,"noop_sec":$noopWall%.1f,"noop_rows_per_sec":${rows / noopWall}%.0f,"noop_steal_sec":$noopSteal%.1f,"cores":$cpus}"""
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_1b_noop.json"),
        (json + "\n").getBytes("UTF-8"))
      println(json)
      spark.stop()
      return
    }
    val (pqWall, pqSteal) = timed("iot-1b-parquet") {
      // Spec-informed sink hints (zstd + per-column dictionary-off for the
      // high-entropy columns): the write is disk-bound, so the smaller
      // bytes ARE the speedup (DriveWriteTune measures this exact config:
      // best wall AND best size of the four candidates at 100M rows —
      // bench_write_tune.json).
      gen(rows).write.mode("overwrite")
        .options(graft.io.Writer.parquetEncodingHints(iot(rows, cpus * 3)))
        .parquet(dir)
    }
    // Sanity: the parquet really holds the full row count.
    val readBack = spark.read.parquet(dir).count()
    require(readBack == rows, s"parquet read-back $readBack != $rows")
    val bytes = {
      def du(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
      du(new java.io.File(dir))
    }
    println(f"CHECK iot-1b-size ${bytes / 1e9}%.1f GB on disk")

    val json =
      f"""{"bench":"gen_iot_1b","rows":$rows,"noop_sec":$noopWall%.1f,"noop_rows_per_sec":${rows / noopWall}%.0f,"parquet_sec":$pqWall%.1f,"parquet_rows_per_sec":${rows / pqWall}%.0f,"parquet_gb":${bytes / 1e9}%.1f,"noop_steal_sec":$noopSteal%.1f,"parquet_steal_sec":$pqSteal%.1f,"cores":$cpus}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_1b.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)

    // Reclaim the ~30 GB; the artifact is the measurement, not the data.
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(dir))
    spark.stop()
  }
}
