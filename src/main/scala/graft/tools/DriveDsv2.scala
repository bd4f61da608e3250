package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver: exercise the graft DSv2 source — format("graft") read,
  * CREATE TABLE USING graft + SELECT, hash parity with the programmatic
  * build, and column pruning. */
object DriveDsv2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.spec._
    val tableSpec = TableSpec("t", 10000, Seq(
      ColumnSpec("k", "bigint", ColumnStrategy.Sequence()),
      ColumnSpec("v", "int", ColumnStrategy.Range(1, 100, Some(1))),
      ColumnSpec("tag", "string", ColumnStrategy.Values(Seq("a", "b", "c")))))
    val planJson = graft.io.PlanJson.saveJson(DataGenPlan(Seq(tableSpec), seed = 42L))

    def hashOf(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(expr("bit_xor(xxhash64(struct(*)))"), lit(0L))).head.getLong(0)

    val viaDsv2 = spark.read.format("graft").option("plan", planJson).load()
    val viaApi = graft.engine.Generator.generate(spark,
      graft.io.PlanJson.loadJson(planJson))("t")
    println(s"CHECK dsv2_rows=${viaDsv2.count()} api_rows=${viaApi.count()}")
    println(s"CHECK hash_match=${hashOf(viaDsv2) == hashOf(viaApi)}")

    spark.sql(s"CREATE TABLE graft_dsv2_tbl USING graft OPTIONS (plan '${planJson.replace("'", "''")}')")
    val viaSql = spark.sql("SELECT k, v, tag FROM graft_dsv2_tbl")
    println(s"CHECK sql_rows=${viaSql.count()} sql_hash_match=${hashOf(viaSql) == hashOf(viaApi)}")

    val pruned = viaDsv2.select("v")
    pruned.collect()
    val scanLine = pruned.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("graft range")).getOrElse("")
    println(s"CHECK pruned_schema=${pruned.schema.fieldNames.mkString(",")}")
    println(s"CHECK partitions=${viaDsv2.rdd.getNumPartitions}")
    spark.sql("DROP TABLE graft_dsv2_tbl")
    spark.stop()
  }
}
