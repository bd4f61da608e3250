package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: the driver's smoke contract — SparkEntry.entry(rows > 0). */
object DriveEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).appName("graft-entry").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"CHECK entry rows=$n (driver smoke needs > 0)")
    spark.stop()
  }
}
