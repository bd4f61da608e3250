package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end drive of the Unigram-LM tokenizer public surface:
  * train on the real documents table, encode the corpus through the
  * fused Viterbi kernel, save/load, and print CHECK lines.
  */
object DriveUnigram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("drive-unigram")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("text").isNotNull)

    val m = graft.llm.UnigramLm.train(docs, "text", vocabSize = 200, maxPieceLen = 6)
    println(s"CHECK pieces=${m.pieces.size}")
    println(s"CHECK ll_trace_len=${m.llTrace.size} ll_last=${m.llTrace.lastOption.getOrElse(Double.NaN)}")

    val enc = graft.llm.UnigramLm.encode(docs, "text", m)
      .withColumn("stripped", concat_ws("", split(lower(trim(col("text"))), "\\s+")))
    val agg = enc.agg(
      count(lit(1)).as("n"),
      sum(size(col("unigram_tokens"))).as("tok"),
      sum(length(col("stripped"))).as("chars"),
      sum(when(concat_ws("", col("unigram_tokens")) === col("stripped"), 0L)
        .otherwise(1L)).as("bad_roundtrip")).collect()(0)
    println(s"CHECK docs=${agg.getLong(0)} tokens=${agg.getLong(1)} chars=${agg.getLong(2)} bad_roundtrip=${agg.getLong(3)}")

    val dir = java.nio.file.Files.createTempDirectory("drive_unigram")
    val path = dir.resolve("m.json").toString
    graft.llm.UnigramLm.save(spark, m, path)
    val m2 = graft.llm.UnigramLm.load(spark, path)
    println(s"CHECK reload_pieces_equal=${m2.pieces == m.pieces}")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)

    spark.stop()
  }
}
