package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.spec._

/** Parquet write-path tuning for the generation sink — the 1B headline's
  * parquet leg is write-bound (371s vs 74s noop), and the IOT spec is
  * dominated by high-cardinality strings (hex ids, template phone
  * numbers, pattern lines) where parquet's dictionary encoder spends CPU
  * building page dictionaries that mostly fall back. This harness times a
  * 100M-row write under candidate codec/dictionary/page configs on the
  * same session, sharing box conditions within a run.
  *
  * Run: `sbt "runMain graft.tools.DriveWriteTune"`. */
object DriveWriteTune {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_WT_ROWS", "100000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def c(n: String, t: String, s: ColumnStrategy) = ColumnSpec(n, t, s)
    def iot(r: Long) = TableSpec("iot", r, Seq(
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
      partitions = Some(cpus * 3))
    def gen(r: Long): DataFrame = graft.engine.Generator.generate(spark,
      DataGenPlan(Seq(iot(r)), 42L))("iot")

    // Warm codegen/JIT.
    gen(10000000L).write.mode("overwrite").format("noop").save()

    def du(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
    }

    val configs: Seq[(String, Map[String, String])] = Seq(
      "snappy_dict" -> Map("compression" -> "snappy"),
      "zstd_dict" -> Map("compression" -> "zstd"),
      "zstd_nodict" -> Map("compression" -> "zstd", "parquet.enable.dictionary" -> "false"),
      // The SHIPPED default: zstd + spec-informed per-column dictionary-off
      // (dictionaries stay ON for low-cardinality columns). Measured
      // directly so Writer.parquetEncodingHints cites its own config, not
      // a proxy (ADVICE r10).
      "zstd_colhints" -> graft.io.Writer.parquetEncodingHints(iot(0L)))

    val out = new StringBuilder
    // Two interleaved rounds: every config sees both halves of the window,
    // min per config — the cheap defense against drifting contention.
    val best = scala.collection.mutable.Map.empty[String, (Double, Double)]
    for (round <- 0 until 2; (name, opts) <- configs) {
      val dir = s"/tmp/graft_wt_$name"
      val t0 = System.nanoTime()
      val w = gen(rows).write.mode("overwrite")
      opts.foreach { case (k, v) => w.option(k, v) }
      w.parquet(dir)
      val wall = (System.nanoTime() - t0) / 1e9
      val gb = du(new java.io.File(dir)) / 1e9
      println(f"CHECK wt round=$round $name wall=$wall%.1fs size=$gb%.1fGB")
      if (!best.contains(name) || wall < best(name)._1) best(name) = (wall, gb)
      rm(new java.io.File(dir))
    }
    configs.foreach { case (name, _) =>
      val (wall, gb) = best(name)
      val line = f"""{"config":"$name","rows":$rows,"best_sec":$wall%.1f,"mrows_per_sec":${rows / wall / 1e6}%.1f,"gb":$gb%.1f}"""
      println(s"CHECK $line")
      out.append(line).append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_write_tune.json"),
      out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
