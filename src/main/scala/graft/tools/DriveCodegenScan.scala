package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: run every registry query, flagging which ones trigger a
  * whole-stage-codegen compile failure (Spark falls back to interpreted
  * execution silently — correct but slow). */
object DriveCodegenScan {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // CodeGenerator logs compile failures through log4j; capture via a
    // custom appender on the codegen logger.
    val logger = org.apache.logging.log4j.LogManager
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    @volatile var hits = 0
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "codegen-scan", null, null, false, null) {
      override def append(event: org.apache.logging.log4j.core.LogEvent): Unit =
        if (event.getLevel.isMoreSpecificThan(org.apache.logging.log4j.Level.ERROR) &&
            String.valueOf(event.getMessage.getFormattedMessage).contains("Failed to compile"))
          hits += 1
    }
    appender.start()
    logger.addAppender(appender)
    logger.setLevel(org.apache.logging.log4j.Level.ERROR)

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val before = hits
      try {
        fn(spark, sf).collect()
        if (hits > before) println(s"CHECK $name CODEGEN_FAIL ${hits - before}")
        else println(s"CHECK $name ok")
      } catch {
        case e: Throwable => println(s"CHECK $name ERROR ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
