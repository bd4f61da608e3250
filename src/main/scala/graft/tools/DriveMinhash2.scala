package graft.tools

import org.apache.spark.sql.SparkSession
import graft.llm.Dedup

object DriveMinhash2 {
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
    t("sig-128")(Dedup.minHashSignatures(docs, "doc_id", "text", 128, 3).count())
    t("sig-64")(Dedup.minHashSignatures(docs, "doc_id", "text", 64, 3).count())
    t("sig-32")(Dedup.minHashSignatures(docs, "doc_id", "text", 32, 3).count())
    spark.conf.set("spark.sql.codegen.maxFields", "400")
    t("sig-128-maxfields")(Dedup.minHashSignatures(docs, "doc_id", "text", 128, 3).count())
    t("sig-128-again")(Dedup.minHashSignatures(docs, "doc_id", "text", 128, 3).count())
    spark.stop()
  }
}
