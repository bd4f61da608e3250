package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time named SparkEntry queries (full materialization via count)
  * at SPARK_GRAFT_SF_DIR. Usage: runMain graft.tools.DriveTimeQ q1 q2 ... */
object DriveTimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false)
      .appName("graft-timeq").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      (1 to 2).foreach { trial =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sf).count()
        println(f"TIME $name trial$trial: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
