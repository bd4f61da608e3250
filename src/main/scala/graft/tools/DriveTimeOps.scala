package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: dump only the time-series queries for a fast local
  * DuckDB compare (see tools/check_correctness.py for the full gate). */
object DriveTimeOps {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_timeops"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("q_asof_join", "q_asof_forward", "q_range_join", "q_sessionize")) {
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[timeops] wrote $name")
    }
    spark.stop()
  }
}
