package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: attribute q_dedup_minhash_cc's wall time per stage at
  * sf0.1 (VERDICT r6 "what's wrong" #1). Prints CHECK lines. */
object DriveCcTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(tag: String): Unit = {
      StageLog.drain()
      val t0 = System.nanoTime()
      val df = StageLog.timed("build_fn")(
        graft.SparkEntry.queries("q_dedup_minhash_cc")(spark, sfDir))
      StageLog.timed("materialize")(
        df.write.mode("overwrite").format("noop").save())
      val total = (System.nanoTime() - t0) / 1e9
      val st = StageLog.drain()
      println(f"CHECK $tag total=$total%.2f " +
        st.map { case (n, v) => f"$n=$v%.2f" }.mkString(" "))
    }
    runOnce("cold")
    runOnce("warm1")
    runOnce("warm2")
    spark.stop()
  }
}
