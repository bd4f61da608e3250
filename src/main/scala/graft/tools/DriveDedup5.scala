package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Scratch: check q_dedup_incremental output against its spec oracle at
  * every test scale. */
object DriveDedup5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val rows = SparkEntry.queries("q_dedup_incremental")(spark, s"/root/testdata/sf$sf")
        .collect()
      println(s"CHECK sf$sf " + rows.map(_.toString).mkString("; "))
    }
    spark.stop()
  }
}
