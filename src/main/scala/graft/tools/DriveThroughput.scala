package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.spec._

/** Scratch: generation throughput at scale + codegen sensitivity. */
object DriveThroughput {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def c(n: String, t: String, s: ColumnStrategy) = ColumnSpec(n, t, s)
    def iot(rows: Long) = TableSpec("iot", rows, Seq(
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
      partitions = Some(96))

    def mat(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def time(label: String, rows: Long)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"CHECK $label%-26s ${s}%6.2f s  ${rows / s / 1e6}%6.2f M rows/s")
    }

    // warmup
    mat(spark.range(1000000).toDF("id"))

    time("iot-10m-default", 10000000L) {
      mat(graft.engine.Generator.generate(spark, DataGenPlan(Seq(iot(10000000L)), 42L))("iot"))
    }
    time("iot-50m-default", 50000000L) {
      mat(graft.engine.Generator.generate(spark, DataGenPlan(Seq(iot(50000000L)), 42L))("iot"))
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("iot-10m-nowscg", 10000000L) {
      mat(graft.engine.Generator.generate(spark, DataGenPlan(Seq(iot(10000000L)), 42L))("iot"))
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // JIT refuses methods over ~8000 bytecodes (DontCompileHugeMethods);
    // Spark's default hugeMethodLimit (65535) still hands such stages to
    // WSCG, which then runs INTERPRETED bytecode. Capping at the JIT limit
    // makes Spark fall back to per-operator codegen for oversized stages.
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    time("iot-10m-jitcap", 10000000L) {
      mat(graft.engine.Generator.generate(spark, DataGenPlan(Seq(iot(10000000L)), 42L))("iot"))
    }
    time("iot-50m-jitcap", 50000000L) {
      mat(graft.engine.Generator.generate(spark, DataGenPlan(Seq(iot(50000000L)), 42L))("iot"))
    }
    spark.conf.unset("spark.sql.codegen.hugeMethodLimit")
    // narrow spec (no template/pattern) to see where the cost is
    time("iot-200m-jitcap", 200000000L) {
      spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
      mat(graft.engine.Generator.generate(spark, DataGenPlan(Seq(iot(200000000L).copy(partitions = Some(192))), 42L))("iot"))
    }
    time("narrow-50m", 50000000L) {
      mat(graft.engine.Generator.generate(spark, DataGenPlan(Seq(
        TableSpec("n", 50000000L, Seq(
          c("a", "bigint", ColumnStrategy.Sequence()),
          c("b", "double", ColumnStrategy.Range(0, 1, continuous = true)),
          c("d", "int", ColumnStrategy.Range(1, 11, Some(1)))),
          partitions = Some(96))), 42L))("n"))
    }
    spark.stop()
  }
}
