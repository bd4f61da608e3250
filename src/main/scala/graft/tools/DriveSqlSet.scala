package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: drive the set-membership SQL surface end-to-end. */
object DriveSqlSet {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", false).appName("graft-sqlset").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      "SELECT graft_any_in_set(array(CAST(2 AS BIGINT), CAST(9 AS BIGINT)), array(9, 11)) AS a, " +
        "graft_count_in_set(array(CAST(9 AS BIGINT), CAST(11 AS BIGINT)), array(9, 11)) AS c").head
    println(s"CHECK sql_set: any=${r.getBoolean(0)} count=${r.getLong(1)}")
    spark.stop()
  }
}
