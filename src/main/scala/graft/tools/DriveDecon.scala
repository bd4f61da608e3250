package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the pipeline's decontaminate stage at 30M scale: same input
  * parquet, same eval construction, same localCheckpoint materialization
  * as Pipeline.curate's step(), but with no near-dup stage before it —
  * separating the stage's OWN cost from its neighbor's deferred debt
  * (GC of retired blocks, async unpersist) in the pipeline attribution. */
object DriveDecon {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 30000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.local.dir", "/tmp/graft_decon_local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(s"/tmp/graft_pipeline_scale_$n")
    def enGood(idc: org.apache.spark.sql.Column) = concat(lit("w"), idc,
      lit("a the quick brown fox jumps over the lazy dog w"), idc,
      lit("b it was good that it is here and now w"), idc, lit("c"))
    val eval = spark.range(64).toDF("k")
      .select((col("k") + n + 7L).as("doc_id"),
        enGood((col("k") * 17 + 6).cast("string")).as("text"))
    // Materialize the input the way the pipeline's prior stage would.
    val cur = corpus.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    println(s"CHECK input_rows=${cur.count()}")
    val t0 = System.nanoTime()
    val out = graft.llm.Decontamination.decontaminate(cur, eval,
      "doc_id", "text", 13).localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"CHECK decon_standalone_wall=$wall%.1f rows_out=${out.count()}")
    val t1 = System.nanoTime()
    val fused = graft.llm.Decontamination.decontaminateAuto(cur, eval,
      "doc_id", "text", 13).localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val wallF = (System.nanoTime() - t1) / 1e9
    println(f"CHECK decon_fused_wall=$wallF%.1f rows_out=${fused.count()}")
    spark.stop()
  }
}
