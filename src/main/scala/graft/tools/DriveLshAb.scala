package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time the cosine-LSH family at sf0.1. */
object DriveLshAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q_dedup_cosine_lsh", "q_dedup_cosine_recall")
    for (q <- qs) {
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    for (q <- qs; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val row = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").collect().head
      println(f"CHECK $q($i) ${(System.nanoTime() - t0) / 1e9}%.2f s $row")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
