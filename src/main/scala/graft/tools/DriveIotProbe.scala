package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: 8 back-to-back runs of the bench_gen_iot_10m body in one JVM,
  * to localize the board headline's 0.80-1.26 s cross-run bi-modality
  * (JIT warm-up inside a JVM vs a whole-JVM mode). */
object DriveIotProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.spec._
    def c(n: String, t: String, st: ColumnStrategy) = ColumnSpec(n, t, st)
    val plan = TableSpec("iot", 10000000L, Seq(
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
      c("phone_number", "string", ColumnStrategy.Template("(ddd)-ddd-dddd")),
      c("event_ts", "timestamp", ColumnStrategy.Timestamp(
        java.time.Instant.parse("2020-01-01T00:00:00Z"),
        java.time.Instant.parse("2020-12-31T23:59:00Z"), 60))),
      partitions = Some(96))
    (1 to 8).foreach { i =>
      val t0 = System.nanoTime()
      graft.engine.Generator.generate(spark,
        DataGenPlan(Seq(plan), 42L))("iot")
        .write.mode("overwrite").format("noop").save()
      println(f"CHECK iter $i wall=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
