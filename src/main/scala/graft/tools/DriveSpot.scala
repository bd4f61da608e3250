package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch spot-runner: evaluates the named SparkEntry queries and prints
  * each result row so bucket-band changes can be validated without the full
  * gate. Usage: runMain graft.tools.DriveSpot q_dist_gamma q_dist_beta */
object DriveSpot {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("graft-spot").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      println(s"CHECK $name: " + df.collect().map(_.toString).mkString(" | "))
    }
    spark.stop()
  }
}
