package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: run q_dedup_stream and print the verdict rows. */
object DriveStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.SparkEntry.queries("q_gen_dsv2")(spark, "/root/testdata/sf0.001")
    out.collect().foreach(r => println("CHECK row " + r.mkString(" | ")))
    println("CHECK n=" + out.count())
    spark.stop()
  }
}
