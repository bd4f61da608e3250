package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: dump q_events_window_stream for a DuckDB compare. */
object DriveStreamWin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q_events_window_stream")(spark, "/root/testdata/sf0.01")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/graft_swin/q_events_window_stream")
    println("[swin] wrote")
    spark.stop()
  }
}
