package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: time the repetition-signal query at sf0.1. */
object DriveTextPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"CHECK $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (q <- Seq("q_text_repetition", "q_text_langid", "q_text_quality")) {
      // warmup JIT/codegen
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      for (_ <- 1 to 2)
        time(q) {
          graft.SparkEntry.queries(q)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
    }
    spark.stop()
  }
}
