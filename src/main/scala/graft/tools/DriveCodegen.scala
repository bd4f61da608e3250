package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.debug._
import graft.spec._

/** Scratch: find which IOT column blows up generated code size. */
object DriveCodegen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def c(n: String, t: String, s: ColumnStrategy) = ColumnSpec(n, t, s)
    val cols = Seq(
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
        java.time.Instant.parse("2020-12-31T23:59:00Z"), 60)))

    def gen(subset: Seq[ColumnSpec], label: String): Unit = {
      val df = graft.engine.Generator.generate(spark,
        DataGenPlan(Seq(TableSpec("t", 10, subset, partitions = Some(2))), 42L))("t")
      val code = df.queryExecution.debug.codegenToSeq()
      val sizes = code.map { case (_, src, _) => src.length }
      println(s"CHECK $label stages=${code.length} srcChars=${sizes.sum}")
    }

    gen(cols, "all-9")
    cols.foreach(cs => gen(Seq(cs), s"only-${cs.name}"))
    gen(cols.filterNot(_.name == "event_ts"), "no-event_ts")
    gen(cols.filterNot(c => Set("phone_number", "line").contains(c.name)), "no-text")
    spark.stop()
  }
}
