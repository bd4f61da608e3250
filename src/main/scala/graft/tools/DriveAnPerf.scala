package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: time q_analyzer_summary variants at sf0.1 and dump the plan. */
object DriveAnPerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", false)
      .appName("graft-anperf").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"TIME $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_returnflag")
    // warm the scan
    df.count()
    t("summarize_exact_1") {
      graft.analyzer.DataAnalyzer.summarizeToDF(df, exact = true).collect()
    }
    t("summarize_exact_2") {
      graft.analyzer.DataAnalyzer.summarizeToDF(df, exact = true).collect()
    }
    t("summarize_approx") {
      graft.analyzer.DataAnalyzer.summarizeToDF(df, exact = false).collect()
    }
    // isolate: exact percentile alone, countDistinct alone
    t("percentile_only") {
      df.agg(percentile(col("l_orderkey"), array(lit(0.25),lit(0.5),lit(0.75))),
             percentile(col("l_linenumber"), array(lit(0.25),lit(0.5),lit(0.75)))).collect()
    }
    t("count_distinct_only") {
      df.agg(countDistinct(col("l_orderkey")), countDistinct(col("l_linenumber")),
             countDistinct(col("l_returnflag"))).collect()
    }
    spark.stop()
  }
}
