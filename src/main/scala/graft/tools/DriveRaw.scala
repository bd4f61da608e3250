package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.NullType
import graft.engine.Generator
import graft.spec._

/** Scratch: bisect the codegen compile failure in q_gen_seed_raw_values. */
object DriveRaw {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val logger = org.apache.logging.log4j.LogManager
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    @volatile var hits = 0
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "raw-scan", null, null, false, null) {
      override def append(event: org.apache.logging.log4j.core.LogEvent): Unit =
        if (String.valueOf(event.getMessage.getFormattedMessage).contains("Failed to compile"))
          hits += 1
    }
    appender.start()
    logger.addAppender(appender)

    def c(n: String, t: String, s: ColumnStrategy) = ColumnSpec(n, t, s)
    def run(label: String, cols: Seq[ColumnSpec]): Unit = {
      val before = hits
      Generator.generate(spark,
        DataGenPlan(Seq(TableSpec("t", 1000, cols))))("t").collect()
      println(s"CHECK $label fails=${hits - before}")
    }

    val baseCols = Seq(
      c("pk", "bigint", ColumnStrategy.Sequence(0, 1)),
      ColumnSpec("a", NullType, ColumnStrategy.Expression("pk % 50 + 1")),
      c("tag", "string", ColumnStrategy.Values(Seq("u", "v"))))

    run("base_only", baseCols)
    run("h_raw", baseCols :+
      c("h_raw", "int", ColumnStrategy.Range(1, 100000, Some(1)))
        .copy(seedMode = SeedMode.FromColumnValues(Seq("a", "tag"))))
    run("h_hash", baseCols :+
      c("h_hash", "int", ColumnStrategy.Range(1, 100000, Some(1)))
        .copy(seedMode = SeedMode.FromColumns(Seq("a", "tag"))))
    run("label", baseCols :+
      c("label", "string", ColumnStrategy.Template("""\v0-\v1""", escapeSpecialChars = true))
        .copy(seedMode = SeedMode.FromColumnValues(Seq("tag", "a"))))
    spark.stop()
  }
}
