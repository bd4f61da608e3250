package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch r18: phase timings of the q_text_bm25 lifecycle at sf0.1. */
object DriveBm25Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).appName("bm25-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = new java.io.File("/dev/shm", "graft_bm25_probe")
    tmp.mkdirs()
    System.setProperty("java.io.tmpdir", tmp.getAbsolutePath)
    val d = "/root/testdata/sf0.1"
    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .where(col("text").isNotNull && col("doc_id") < 300)
      val base = docs.where(col("doc_id") < 250)
      val batch = docs.where(col("doc_id") >= 250)
      val queries = docs.where(col("doc_id").isin(1, 3, 5))
        .select(col("doc_id").as("q_id"),
          array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 8), " ")
            .as("q_text"))
      val dir = java.nio.file.Files.createTempDirectory("bm25_idx")
      val dirFull = java.nio.file.Files.createTempDirectory("bm25_idx_full")
      phase("lock_noop") {
        graft.io.WriterLock.withLock(spark, dirFull.toString + "_lk", "probe") { () }
      }
      val appended = {
        phase("build_base") {
          graft.llm.Retrieval.buildAndWriteIndex(base, "doc_id", "text",
            dir.toString, nBuckets = 8)
        }
        phase("append") {
          graft.llm.Retrieval.appendToBm25Index(batch, "doc_id", "text", dir.toString)
        }
      }
      val rebuilt = phase("rebuild_full") {
        graft.llm.Retrieval.buildAndWriteIndex(docs, "doc_id", "text",
          dirFull.toString, nBuckets = 8)
      }
      val sA = graft.llm.Retrieval.scores(appended, queries, "q_id", "q_text")
      val sR = graft.llm.Retrieval.scores(rebuilt, queries, "q_id", "q_text")
        .withColumnRenamed("score", "score_r").localCheckpoint()
      phase("compare_append") {
        sA.join(sR, Seq("q_id", "doc_id"), "full_outer")
          .agg(org.apache.spark.sql.functions.every(
            abs(col("score") - col("score_r")) < 1e-9)).collect()
      }
      phase("compact") {
        graft.llm.Retrieval.compactBm25Index(spark, dir.toString, dlFiles = 2)
      }
      val sC = phase("score_compacted") {
        val x = graft.llm.Retrieval.scores(
          graft.llm.Retrieval.loadIndex(spark, dir.toString), queries, "q_id", "q_text")
        x.count(); x
      }
      phase("compare_compact") {
        sC.join(sR, Seq("q_id", "doc_id"), "full_outer")
          .agg(org.apache.spark.sql.functions.every(
            abs(col("score") - col("score_r")) < 1e-9)).collect()
      }
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
      org.apache.commons.io.FileUtils.deleteQuietly(dirFull.toFile)
    }
    spark.stop()
  }
}
