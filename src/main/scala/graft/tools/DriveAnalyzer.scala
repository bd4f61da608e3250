package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: print the analyzer summary (with quartiles) and the
  * shape-aware reverse-engineered spec. */
object DriveAnalyzer {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_returnflag")
    graft.analyzer.DataAnalyzer.summarizeToDF(li, exact = true).collect()
      .foreach(r => println("CHECK summary " + r.mkString(" | ")))
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val code = graft.analyzer.DataAnalyzer.scriptDataGeneratorFromData(orders, "orders")
    code.linesIterator.foreach(l => println("CHECK script " + l))
    spark.stop()
  }
}
