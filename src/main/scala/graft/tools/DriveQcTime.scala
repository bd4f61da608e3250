package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times the q_quality_classifier gate query in isolation — used to
  * compare GD-iteration formulations (two jobs vs fused) outside a full
  * board run. */
object DriveQcTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fn = graft.queries.LlmQueries.queries("q_quality_classifier")
    // warm
    fn(spark, sf).collect()
    for (i <- 0 until 2) {
      val t0 = System.nanoTime()
      fn(spark, sf).collect()
      println(f"CHECK attempt$i=${(System.nanoTime() - t0) / 1e9}%.2f sec")
    }
    spark.stop()
  }
}
