package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch r18: fixed overhead of tiny parquet writes — plain vs
  * dynamic-partitioned vs committer algorithm, on the tmpfs working set. */
object DriveWriteProbe {
  def main(args: Array[String]): Unit = {
    val algo = args.headOption.getOrElse("1")
    // arg 2: "bare" -> graft.io.BareLocalFs (no chmod/no .crc), else stock.
    val bare = args.length > 1 && args(1) == "bare"
    val b0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", algo)
      .config("spark.ui.enabled", false).appName("write-probe")
    val spark = (if (bare) b0.config("spark.hadoop.fs.file.impl",
      classOf[graft.io.BareLocalFs].getName) else b0).getOrCreate()
    println(s"[write-probe] bareLocalFs=$bare")
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = new java.io.File("/dev/shm", "graft_write_probe")
    org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    tmp.mkdirs()
    val df = spark.range(2000).select(col("id"),
      pmod(col("id"), lit(8)).as("tb"), rand(7).as("x")).localCheckpoint()
    def t(name: String, n: Int)(body: Int => Unit): Unit = {
      body(-1) // warm
      val t0 = System.nanoTime()
      (0 until n).foreach(body)
      println(f"WRITE $name ${(System.nanoTime() - t0) / 1e9 / n}%.3f s/op (algo=$algo)")
    }
    t("plain", 10)(i => df.coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/plain$i"))
    t("plain32", 10)(i => df.write.mode("overwrite").parquet(s"$tmp/p32_$i"))
    t("partitionBy", 10)(i => df.repartition(col("tb")).write.mode("overwrite")
      .partitionBy("tb").parquet(s"$tmp/part$i"))
    t("partitionBy_nosort", 10)(i => df.repartition(col("tb"))
      .sortWithinPartitions("tb").write.mode("overwrite")
      .partitionBy("tb").parquet(s"$tmp/ps$i"))
    t("append", 10)(i => df.coalesce(1).write.mode("append").parquet(s"$tmp/app"))
    org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    spark.stop()
  }
}
