package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Scratch: profile the minhash near-dup pipeline stage by stage. */
object DriveMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"CHECK $label%-24s n=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    t("shingle-explode")(docs.select(explode(Dedup.shingles(col("text"), 3))).count())
    t("signatures")(Dedup.minHashSignatures(docs, "doc_id", "text", 128, 3).count())
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 128, 3)
      .withColumn("bandkey", explode(Dedup.lshBandKeys(col("sig"), 64, 2)))
      .select("id", "sh", "bandkey")
    t("band-explode")(sigs.count())
    t("full-op")(Dedup.nearDupMinHash(docs, "doc_id", "text",
      threshold = 0.5, numHashes = 128, bands = 64).count())
    t("full-op-again")(Dedup.nearDupMinHash(docs, "doc_id", "text",
      threshold = 0.5, numHashes = 128, bands = 64).count())
    spark.stop()
  }
}
