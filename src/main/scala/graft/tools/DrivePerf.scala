package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch perf probe: distinct-count strategies at sf0.1. */
object DrivePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("drive-perf")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_returnflag")

    val names = Seq("l_orderkey", "l_linenumber", "l_returnflag")
    val qs = array(lit(0.25), lit(0.5), lit(0.75))
    def basic(n: String): Seq[Column] = Seq(count(col(n)), min(col(n)), max(col(n)))
    def timeIt(label: String)(body: => Unit): Double = {
      body // warm
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"CHECK $label best=$t%.2f"); t
    }

    timeIt("cdist_alone") {
      df.agg(countDistinct(col(names.head)), names.tail.map(n => countDistinct(col(n))): _*).collect()
    }
    timeIt("cdist_sumlast") {
      // one count_distinct rewrite-free shape: groupBy each col separately via
      // three independent 1-column jobs
      names.foreach(n => df.select(n).distinct().count())
    }
    timeIt("two_job_split") {
      val a = df.agg((names.flatMap(basic) ++
        Seq("l_orderkey", "l_linenumber").map(n => percentile(col(n), qs))).head,
        (names.flatMap(basic) ++
          Seq("l_orderkey", "l_linenumber").map(n => percentile(col(n), qs))).tail: _*)
      val b = df.agg(countDistinct(col(names.head)), names.tail.map(n => countDistinct(col(n))): _*)
      a.collect(); b.collect()
    }
    spark.stop()
  }
}
