package graft.tools

import org.apache.spark.sql.SparkSession

/** Bisect harness for the q_dedup_minhash_cc r14 regression (VERDICT r14
  * What's-wrong #4): times the exact registry query at sf0.1 in a warmed
  * JVM, N trials. Run twice — once as-is (serialized candidate
  * checkpoints, the r14 default) and once with
  * `-Dgraft.dedup.deserializedCheckpoints=true` — and compare the trial
  * minima. Prints CHECK lines. */
object DriveCcBisect {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val trials = args.headOption.map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "48g")
      .appName("cc-bisect").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("q_dedup_minhash_cc")
    def once(dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    once("/root/testdata/sf0.001") // codegen warmup
    once("/root/testdata/sf0.01")  // JIT warmup
    val mode = if (java.lang.Boolean.getBoolean("graft.dedup.deserializedCheckpoints"))
      "deserialized" else "serialized"
    val walls = (1 to trials).map { i =>
      val w = once(sf)
      println(f"CHECK cc[$mode] trial $i: $w%.3f s")
      w
    }
    println(f"CHECK cc[$mode] min=${walls.min}%.3f median=${walls.sorted.apply(trials / 2)}%.3f")
    spark.stop()
  }
}
