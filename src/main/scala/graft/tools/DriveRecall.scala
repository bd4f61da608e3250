package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print the cosine-LSH recall query row per sf. */
object DriveRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val row = graft.SparkEntry.queries("q_dedup_cosine_recall")(spark, s"/root/testdata/$sf")
        .collect().head
      println(s"CHECK $sf $row")
    }
    spark.stop()
  }
}
