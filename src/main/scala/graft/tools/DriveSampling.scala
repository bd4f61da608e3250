package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: print the sampling/mixing query outputs at sf0.01. */
object DriveSampling {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("q_sample_split", "q_corpus_mix")) {
      val rows = graft.SparkEntry.queries(name)(spark, sfDir).collect()
      println(s"CHECK $name ${rows.mkString(" | ")}")
    }
    spark.stop()
  }
}
