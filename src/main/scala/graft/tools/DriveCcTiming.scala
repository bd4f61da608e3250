package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: attribute q_dedup_minhash_cc's wall time per stage under
  * bench-like conditions (sf0.001 warmup pass, then the dedup family timed
  * in alphabetical order at sf0.1 — VERDICT r6 "what's wrong" #1). */
object DriveCcTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val family = Seq("q_dedup_exact", "q_dedup_incremental", "q_dedup_keepfirst",
      "q_dedup_minhash", "q_dedup_minhash_cc", "q_dedup_minhash_drop",
      "q_dedup_minhash_recall")

    def mat(name: String, dir: String): Unit =
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()

    // Bench-style warmup at the smallest scale.
    family.foreach { n => try mat(n, "/root/testdata/sf0.001") catch { case _: Exception => () } }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    StageLog.drain()

    family.foreach { n =>
      val t0 = System.nanoTime()
      mat(n, sfDir)
      val total = (System.nanoTime() - t0) / 1e9
      val st = StageLog.drain()
      println(f"CHECK $n%-24s total=$total%.2f " +
        st.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
