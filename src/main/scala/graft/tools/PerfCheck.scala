package graft.tools

import org.apache.spark.sql.SparkSession

/** Quick local timing of a subset of registry queries (iteration aid, not a
  * driver artifact). Usage: `sbt "runMain graft.tools.PerfCheck q1 q2 ..."`;
  * no args = the dedup/similarity hot set. Set PERF_EXPLAIN=1 to dump the
  * formatted plan of each query; PERF_REPEAT=n to time n runs. */
object PerfCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = sys.env.get("PERF_EXPLAIN").contains("1")
    val repeat = sys.env.getOrElse("PERF_REPEAT", "1").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_embed_cosine_pairs", "q_dedup_simhash", "q_dedup_ngram_jaccard",
      "q_dedup_minhash", "q_dedup_minhash_drop", "q_dedup_cosine_lsh")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.codegen.maxFields", "400")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/documents.parquet").limit(1).collect()

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to repeat).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (explain && i == 1) df.explain("formatted")
        df.write.mode("overwrite").format("noop").save()
        println(f"[perf] $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
